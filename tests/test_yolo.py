import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniparser_tpu.models.yolov8 import (
    Detector,
    YOLOv8,
    decode_predictions,
    REG_MAX,
    STRIDES,
    VARIANTS,
    _ch,
    _depth,
)


@pytest.fixture(scope="module")
def small_detector():
    det = Detector(variant="n", num_classes=1, imgsz=160, max_det=32)
    params = det.init_params(jax.random.PRNGKey(0))
    return det, params


def test_channel_scaling():
    # published yolov8n widths
    assert _ch(64, 0.25, 1024) == 16
    assert _ch(1024, 0.25, 1024) == 256
    # yolov8m max_channels clamp
    assert _ch(1024, 0.75, 768) == 576
    assert _depth(6, 0.33) == 2
    assert _depth(3, 0.33) == 1


def test_forward_shapes(small_detector):
    det, params = small_detector
    x = jnp.zeros((2, 160, 160, 3), jnp.float32)
    outs = det.module.apply(params, x, train=False)
    assert len(outs) == 3
    for (box, cls), stride in zip(outs, STRIDES):
        assert box.shape == (2, 160 // stride, 160 // stride, 4 * REG_MAX)
        assert cls.shape == (2, 160 // stride, 160 // stride, 1)


def test_decode_geometry():
    # zero logits -> DFL expectation = mean bin = 7.5 strides each side
    b, s = 1, 160
    outs = []
    for stride in STRIDES:
        h = s // stride
        outs.append((jnp.zeros((b, h, h, 4 * REG_MAX)), jnp.zeros((b, h, h, 1))))
    boxes, scores = decode_predictions(outs)
    total = sum((s // st) ** 2 for st in STRIDES)
    assert boxes.shape == (1, total, 4)
    # first anchor of stride 8: center (0.5, 0.5) strides, dist 7.5 strides
    np.testing.assert_allclose(
        np.asarray(boxes[0, 0]), [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, 8 * 8, 8 * 8], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(scores), 0.5, atol=1e-6)


def test_detect_end_to_end_random_weights(small_detector, rng):
    det, params = small_detector
    img = rng.integers(0, 255, (120, 150, 3), dtype=np.uint8)
    from omniparser_tpu.ops.preprocess import pad_to_bucket

    padded, (h, w) = pad_to_bucket(img, 160, 160)
    boxes, scores, valid = det.detect(
        params, jnp.asarray(padded), jnp.asarray([h, w]), 0.05, 0.1
    )
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert boxes.shape == (32, 4) and valid.dtype == bool
    if valid.any():
        kept = boxes[valid]
        assert (kept >= -1e-5).all() and (kept <= 1 + 1e-5).all()
        assert (scores[valid] > 0.05).all()


def test_detect_is_deterministic(small_detector, rng):
    det, params = small_detector
    img = rng.integers(0, 255, (160, 160, 3), dtype=np.uint8)
    a = det.detect(params, jnp.asarray(img), jnp.asarray([160, 160]), 0.05, 0.1)
    b = det.detect(params, jnp.asarray(img), jnp.asarray([160, 160]), 0.05, 0.1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_param_count_sanity():
    # yolov8n ~3.2M params; ours should land in the same ballpark
    det = Detector(variant="n", num_classes=1, imgsz=64)
    params = det.init_params(jax.random.PRNGKey(0))
    n = sum(p.size for p in jax.tree.leaves(params["params"]))
    assert 2_500_000 < n < 4_000_000, f"param count {n}"
