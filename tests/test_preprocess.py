import numpy as np
import jax.numpy as jnp
import cv2
import pytest

from omniparser_tpu.ops import preprocess as P


def _rand_image(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_pick_bucket():
    assert P.pick_bucket(480, 620, (640, 1280)) == 640
    assert P.pick_bucket(800, 600, (640, 1280)) == 1280
    assert P.pick_bucket(4000, 100, (640, 1280)) == 1280


def test_pick_bucket_2d():
    # 4K screenshots (ScreenSpot-Pro) must land in a containing bucket
    assert P.pick_bucket_2d(2159, 3239, step=512) == (2560, 3584)
    assert P.pick_bucket_2d(512, 512, step=512) == (512, 512)
    # default step is 128 (upload-wire economy; see pick_bucket_2d docstring)
    assert P.pick_bucket_2d(2159, 3239) == (2176, 3328)
    assert P.pick_bucket_2d(1079, 1919) == (1152, 1920)
    assert P.pick_bucket_2d(128, 128) == (128, 128)
    with pytest.raises(ValueError):
        P.pick_bucket_2d(9000, 100, max_side=8192)


def test_letterbox_nonsquare_bucket(rng):
    # wide image in a non-square bucket -> vertical gray bands only
    img = _rand_image(rng, 200, 600)
    padded, _ = P.pad_to_bucket(img, 256, 640)
    out, r, (pad_y, pad_x) = P.letterbox(jnp.asarray(padded), jnp.asarray([200, 600]), 320)
    assert out.shape == (320, 320, 3)
    assert float(r) == pytest.approx(320 / 600, abs=1e-4)
    assert float(pad_x) == pytest.approx(0.0, abs=1e-2)
    assert float(pad_y) == pytest.approx((320 - 200 * 320 / 600) / 2, abs=1e-2)


def test_pad_to_bucket(rng):
    img = _rand_image(rng, 100, 200)
    padded, (h, w) = P.pad_to_bucket(img, 256, 256)
    assert padded.shape == (256, 256, 3) and (h, w) == (100, 200)
    np.testing.assert_array_equal(padded[:100, :200], img)
    assert padded[100:].sum() == 0
    with pytest.raises(ValueError):
        P.pad_to_bucket(img, 64, 64)


def test_letterbox_geometry(rng):
    # 100x200 (h,w) -> 320 bucket: r = 320/200 = 1.6, new_h=160 -> pad_y=80
    img = _rand_image(rng, 100, 200)
    padded, _ = P.pad_to_bucket(img, 320, 320)
    out, r, (pad_y, pad_x) = P.letterbox(jnp.asarray(padded), jnp.asarray([100, 200]), 320)
    assert out.shape == (320, 320, 3)
    assert float(r) == pytest.approx(1.6, abs=1e-4)
    assert float(pad_y) == pytest.approx(80.0, abs=1e-2)
    assert float(pad_x) == pytest.approx(0.0, abs=1e-2)
    out_np = np.asarray(out)
    # letterbox bands are the 114 gray fill
    np.testing.assert_allclose(out_np[:79], 114.0 / 255.0, atol=1e-5)
    np.testing.assert_allclose(out_np[241:], 114.0 / 255.0, atol=1e-5)
    # interior roughly matches cv2 resize
    ref = cv2.resize(img, (320, 160), interpolation=cv2.INTER_LINEAR) / 255.0
    got = out_np[80:240]
    assert np.abs(got - ref).mean() < 0.02


def test_letterbox_roundtrip_boxes(rng):
    img = _rand_image(rng, 150, 300)
    padded, _ = P.pad_to_bucket(img, 320, 320)
    _, r, pad = P.letterbox(jnp.asarray(padded), jnp.asarray([150, 300]), 320)
    # a box at original pixels [30, 40, 90, 100] -> letterboxed -> back
    orig = jnp.asarray([[30.0, 40.0, 90.0, 100.0]])
    pad_y, pad_x = pad
    lb = orig * r + jnp.stack([pad_x, pad_y, pad_x, pad_y])
    back = P.boxes_letterboxed_to_image(lb, r, pad, jnp.asarray([150, 300]))
    np.testing.assert_allclose(np.asarray(back), np.asarray(orig), atol=1e-4)


def test_crop_resize_matches_cv2(rng):
    img = _rand_image(rng, 200, 300)
    padded, _ = P.pad_to_bucket(img, 256, 320)
    boxes = np.array(
        [
            [0.1, 0.1, 0.5, 0.6],
            [0.0, 0.0, 0.3, 0.2],
            [0.55, 0.3, 0.95, 0.9],
        ],
        np.float32,
    )
    got = np.asarray(
        P.crop_resize_batch(jnp.asarray(padded), jnp.asarray([200, 300]), jnp.asarray(boxes), 64)
    )
    for i, b in enumerate(boxes):
        x1, x2 = int(b[0] * 300), int(b[2] * 300)
        y1, y2 = int(b[1] * 200), int(b[3] * 200)
        ref = cv2.resize(img[y1:y2, x1:x2], (64, 64), interpolation=cv2.INTER_LINEAR).astype(
            np.float32
        )
        diff = np.abs(got[i] - ref)
        assert diff.mean() < 1.5, f"crop {i}: mean abs diff {diff.mean()}"


def test_crop_resize_degenerate_box(rng):
    # zero/negative extent boxes must not NaN (reference would crash upstream)
    img = _rand_image(rng, 64, 64)
    padded, _ = P.pad_to_bucket(img, 64, 64)
    boxes = np.array([[0.5, 0.5, 0.5, 0.5], [0.9, 0.9, 0.1, 0.1]], np.float32)
    got = np.asarray(
        P.crop_resize_batch(jnp.asarray(padded), jnp.asarray([64, 64]), jnp.asarray(boxes), 32)
    )
    assert np.isfinite(got).all()


def test_mxu_crop_matches_gather(rng):
    # ops/mxu_crop reformulates the bilinear crop as one-hot matmuls; the
    # taps are exact in bf16 and the combine shares _bilinear_gather's
    # expression tree, so outputs must be bitwise-equal to the gather path
    from omniparser_tpu.ops import mxu_crop as M

    img = _rand_image(rng, 200, 300)
    padded, _ = P.pad_to_bucket(img, 256, 320)
    hw = jnp.asarray([200, 300])
    boxes = jnp.asarray(
        [
            [0.1, 0.1, 0.5, 0.6],
            [0.0, 0.0, 0.3, 0.2],
            [0.55, 0.3, 0.95, 0.9],
            [0.5, 0.5, 0.5, 0.5],   # degenerate
            [0.02, 0.01, 0.98, 0.99],  # taller than LINE_BAND -> fallback
        ],
        jnp.float32,
    )
    pj = jnp.asarray(padded)
    ref = np.asarray(P.crop_resize_batch(pj, hw, boxes, 64))
    got = np.asarray(M.crop_resize_mxu(pj, hw, boxes, 64))
    np.testing.assert_array_equal(got, ref)

    ref_l = np.asarray(P.crop_lines_batch(pj, hw, boxes, (32, 160)))
    got_l = np.asarray(M.crop_lines_mxu(pj, hw, boxes, (32, 160), band_h=64))
    np.testing.assert_array_equal(got_l, ref_l)
