"""Pallas kernels vs XLA references — exact-match (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from omniparser_tpu.ops.boxes import containment_ratio, pairwise_max_overlap_ratio
from omniparser_tpu.ops.nms import _plain_pairwise_iou
from omniparser_tpu.ops.pallas_kernels import pallas_nms_keep, pallas_overlap_matrices
from tests.conftest import random_boxes
from tests import oracles


def test_pallas_nms_matches_oracle(rng):
    for trial in range(4):
        n = 64
        boxes = random_boxes(rng, n, max_size=0.5)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores)
        sboxes, svalid = boxes[order], np.ones(n, bool)
        keep = np.asarray(
            pallas_nms_keep(jnp.asarray(sboxes), jnp.asarray(svalid), 0.3, interpret=True)
        )
        got = list(order[keep])
        want = oracles.greedy_nms(boxes, scores, 0.3)
        assert got == want, f"trial {trial}"


def test_pallas_nms_respects_valid(rng):
    n = 32
    boxes = random_boxes(rng, n)
    valid = np.zeros(n, bool)
    valid[:7] = True
    keep = np.asarray(
        pallas_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )
    assert not keep[7:].any()


def test_pallas_overlap_matrices_match_xla(rng):
    icons = random_boxes(rng, 48, max_size=0.3)
    ocr = random_boxes(rng, 32, max_size=0.15)
    ratio, a, b = pallas_overlap_matrices(jnp.asarray(icons), jnp.asarray(ocr), interpret=True)
    want_ratio = pairwise_max_overlap_ratio(jnp.asarray(icons), jnp.asarray(icons))
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(want_ratio), rtol=1e-5, atol=1e-6)
    want_a = np.asarray(containment_ratio(jnp.asarray(ocr), jnp.asarray(icons))).T > 0.80
    want_b = np.asarray(containment_ratio(jnp.asarray(icons), jnp.asarray(ocr))) > 0.80
    np.testing.assert_array_equal(np.asarray(a), want_a)
    np.testing.assert_array_equal(np.asarray(b), want_b)


def test_pallas_overlap_zero_area_boxes(rng):
    icons = np.array([[0.1, 0.1, 0.1, 0.5], [0.2, 0.2, 0.4, 0.4]], np.float32)
    ocr = np.array([[0.25, 0.25, 0.3, 0.3]], np.float32)
    ratio, a, b = pallas_overlap_matrices(jnp.asarray(icons), jnp.asarray(ocr), interpret=True)
    assert np.isfinite(np.asarray(ratio)).all()
    assert not np.asarray(a)[0].any()  # zero-area icon can't contain
