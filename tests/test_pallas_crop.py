"""Pallas crop-gather vs the XLA reference — exact sampling parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from omniparser_tpu.ops.pallas_crop import pallas_crop_resize
from omniparser_tpu.ops.preprocess import crop_resize_batch, pad_to_bucket


def _run_both(rng, h, w, hb, wb, boxes, out=32):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    padded, _ = pad_to_bucket(img, hb, wb)
    hw = jnp.asarray([h, w], jnp.int32)
    got = np.asarray(pallas_crop_resize(
        jnp.asarray(padded), hw, jnp.asarray(boxes), out, interpret=True
    ))
    want = np.asarray(crop_resize_batch(jnp.asarray(padded), hw, jnp.asarray(boxes), out))
    return got, want


def test_matches_xla_random_boxes(rng):
    boxes = np.array(
        [[0.1, 0.1, 0.5, 0.6], [0.0, 0.0, 0.3, 0.2], [0.55, 0.3, 0.95, 0.9],
         [0.2, 0.7, 0.9, 0.99]], np.float32,
    )
    got, want = _run_both(rng, 100, 150, 128, 256, boxes)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_matches_xla_edge_boxes(rng):
    # boxes touching the image borders exercise the clamp paths
    boxes = np.array(
        [[0.0, 0.0, 1.0, 1.0], [0.9, 0.9, 1.0, 1.0], [0.0, 0.5, 0.05, 0.55]],
        np.float32,
    )
    got, want = _run_both(rng, 64, 80, 64, 128, boxes, out=16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_upscale_small_box(rng):
    # a 3x3-px box upscaled to 32x32
    boxes = np.array([[0.50, 0.50, 0.53, 0.53]], np.float32)
    got, want = _run_both(rng, 100, 100, 128, 128, boxes)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
