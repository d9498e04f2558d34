import numpy as np
import jax.numpy as jnp

from omniparser_tpu.ops.nms import nms_fixed_shape
from tests.conftest import random_boxes
from tests import oracles


def _run(boxes, scores, valid, thr, max_out=64):
    ob, os_, oi, ov = nms_fixed_shape(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr, max_out
    )
    return np.asarray(ob), np.asarray(os_), np.asarray(oi), np.asarray(ov)


def test_nms_matches_greedy_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 40, max_size=0.5)
        scores = rng.uniform(0.1, 1.0, size=40).astype(np.float32)
        valid = np.ones(40, bool)
        _, _, idx, keep_valid = _run(boxes, scores, valid, 0.3)
        got = list(idx[keep_valid])
        want = oracles.greedy_nms(boxes, scores, 0.3)
        assert got == want, f"trial {trial}"


def test_nms_respects_padding(rng):
    boxes = random_boxes(rng, 16)
    scores = rng.uniform(0.5, 1.0, 16).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:5] = True
    _, _, idx, keep_valid = _run(boxes, scores, valid, 0.5)
    assert set(idx[keep_valid]) <= set(range(5))
    want = oracles.greedy_nms(boxes[:5], scores[:5], 0.5)
    assert list(idx[keep_valid]) == want


def test_nms_identical_boxes_keep_highest():
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (4, 1))
    scores = np.array([0.2, 0.9, 0.5, 0.7], np.float32)
    valid = np.ones(4, bool)
    ob, os_, idx, keep_valid = _run(boxes, scores, valid, 0.5)
    assert keep_valid.sum() == 1
    assert idx[0] == 1 and os_[0] == np.float32(0.9)


def test_nms_select_max_matches_oracle(rng):
    """N > 1024 routes to the select-max variant (O(N) memory, max_out
    sequential steps — DetectorConfig.prefilter_topk windows); keep-set
    must still equal the greedy oracle truncated to max_out."""
    n = 1536
    boxes = random_boxes(rng, n, max_size=0.25)
    scores = rng.uniform(0.05, 1.0, size=n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 100)] = False
    _, os_, idx, keep_valid = _run(boxes, scores, valid, 0.3, max_out=128)
    got = list(idx[keep_valid])
    want = oracles.greedy_nms(boxes[valid], scores[valid], 0.3)
    want = [np.nonzero(valid)[0][j] for j in want][:128]
    assert got == want
    assert np.all(np.diff(os_[keep_valid]) <= 0)


def test_nms_select_max_equals_matrix_path(rng):
    """The two device implementations must agree exactly (same inputs pass
    either the n<=1024 matrix loop or the select-max loop depending only
    on padding)."""
    n = 800
    boxes = random_boxes(rng, n, max_size=0.3)
    scores = rng.uniform(0.05, 1.0, size=n).astype(np.float32)
    valid = np.ones(n, bool)
    _, _, idx_small, kv_small = _run(boxes, scores, valid, 0.2, max_out=64)
    # pad to >1024 slots with invalid entries to force the select-max path
    pad = 1200
    bp = np.zeros((pad, 4), np.float32)
    bp[:n] = boxes
    sp = np.zeros(pad, np.float32)
    sp[:n] = scores
    vp = np.zeros(pad, bool)
    vp[:n] = True
    _, _, idx_big, kv_big = _run(bp, sp, vp, 0.2, max_out=64)
    assert list(idx_small[kv_small]) == list(idx_big[kv_big])


def test_nms_truncates_to_max_out(rng):
    # disjoint boxes: all kept, but only max_out slots returned (top scores)
    n = 20
    boxes = np.stack(
        [np.array([i * 0.05, 0.0, i * 0.05 + 0.04, 0.04], np.float32) for i in range(n)]
    )
    scores = np.linspace(0.1, 0.9, n).astype(np.float32)
    valid = np.ones(n, bool)
    ob, os_, idx, keep_valid = _run(boxes, scores, valid, 0.5, max_out=8)
    assert keep_valid.sum() == 8
    # highest scores first
    assert np.all(np.diff(os_[keep_valid]) <= 0)
    assert os_[0] == np.float32(0.9)
