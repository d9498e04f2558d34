"""Image preprocessing as on-device, fixed-shape ops.

The reference does all of this on host with cv2/PIL, per image and per crop
(util/utils.py:87-93 crop+resize loop; ultralytics' internal letterbox).
Here the raw screenshot is host-padded (memcpy only) into a static uint8
bucket, enters HBM once, and everything else — letterbox resize,
normalization, N-box crop-gather to 64x64 patches — is one jitted graph.

Dynamic *values* (true image size, box coords) ride through as traced
scalars; only bucket shapes are static, so XLA compiles once per bucket.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# ultralytics letterbox fill (YOLO convention)
LETTERBOX_FILL = 114.0


def pick_bucket(h: int, w: int, buckets: Tuple[int, ...]) -> int:
    """Smallest bucket that fits the longer side; else the largest bucket."""
    longest = max(h, w)
    for b in sorted(buckets):
        if longest <= b:
            return b
    return max(buckets)


def pick_bucket_2d(h: int, w: int, step: int = 128, max_side: int = 8192) -> Tuple[int, int]:
    """Per-axis static bucket: round each dim up to a multiple of `step`.

    Raw screenshots can be 4K+ (ScreenSpot-Pro), far above any detector
    input size — the raw bucket only needs to *contain* the image; the
    jitted letterbox scales down from it with a dynamic ratio.  Compiled
    graph count = distinct (Hb, Wb) pairs actually seen (cached).

    step=128 (was 512 through round 4): the padded buffer IS the
    host->device upload, and the tunnel wire is the serving bottleneck
    (PERF.md).  On the 8 reference screenshots at the 1920 upload cap,
    512-step buckets transfer 67.6 MB vs 51.0 MB at 128-step — a 25%
    wire cut for at most a handful of extra cached graphs (5 distinct
    buckets vs 4 on that set).  128 keeps W a multiple of the TPU lane
    width; the persistent compilation cache absorbs the extra compiles.
    """
    hb = min(-(-h // step) * step, max_side)
    wb = min(-(-w // step) * step, max_side)
    if h > hb or w > wb:
        raise ValueError(f"image {h}x{w} exceeds max_side {max_side}")
    return hb, wb


def pad_to_bucket(image_u8, bucket_h: int, bucket_w: int):
    """Host-side: zero-pad a [H,W,3] uint8 array into the static bucket.

    Returns (padded [bucket_h,bucket_w,3], (h, w)). Pure memcpy — the only
    host work before upload.
    """
    import numpy as np

    h, w = image_u8.shape[:2]
    if h > bucket_h or w > bucket_w:
        raise ValueError(f"image {h}x{w} exceeds bucket {bucket_h}x{bucket_w}")
    out = np.zeros((bucket_h, bucket_w, 3), dtype=np.uint8)
    out[:h, :w] = image_u8
    return out, (h, w)


@partial(jax.jit, static_argnames=("target",))
def letterbox(padded_u8: jnp.ndarray, orig_hw: jnp.ndarray, target: int):
    """Letterbox a bucket-padded uint8 image to (target, target) float32 [0,1].

    Matches YOLO convention: scale r = min(target/h, target/w), centered,
    gray(114) fill.  orig_hw is a traced int32 [2] (h, w) — same compiled
    graph serves every image size within the bucket.

    Returns (image [target,target,3] float32 in [0,1], scale r, pad (py, px)).
    """
    h = orig_hw[0].astype(jnp.float32)
    w = orig_hw[1].astype(jnp.float32)
    r = jnp.minimum(target / h, target / w)
    new_h, new_w = h * r, w * r
    pad_y = (target - new_h) / 2.0
    pad_x = (target - new_w) / 2.0

    img = padded_u8.astype(jnp.float32)
    scaled = jax.image.scale_and_translate(
        img,
        shape=(target, target, 3),
        spatial_dims=(0, 1),
        scale=jnp.stack([r, r]),
        translation=jnp.stack([pad_y, pad_x]),
        method="linear",
        antialias=False,
    )
    # scale_and_translate fills out-of-source with 0; swap in the 114 fill.
    yy = jnp.arange(target, dtype=jnp.float32)[:, None]
    xx = jnp.arange(target, dtype=jnp.float32)[None, :]
    inside = (
        (yy >= jnp.floor(pad_y))
        & (yy < jnp.ceil(pad_y + new_h))
        & (xx >= jnp.floor(pad_x))
        & (xx < jnp.ceil(pad_x + new_w))
    )
    out = jnp.where(inside[..., None], scaled, LETTERBOX_FILL)
    return out / 255.0, r, (pad_y, pad_x)


def boxes_letterboxed_to_image(boxes_xyxy: jnp.ndarray, r, pad_yx, orig_hw):
    """Map detector boxes from letterboxed coords back to original pixels,
    clamped to the image (ultralytics scale_boxes semantics)."""
    pad_y, pad_x = pad_yx
    h = orig_hw[0].astype(jnp.float32)
    w = orig_hw[1].astype(jnp.float32)
    shift = jnp.stack([pad_x, pad_y, pad_x, pad_y])
    out = (boxes_xyxy - shift) / r
    lim = jnp.stack([w, h, w, h])
    return jnp.clip(out, 0.0, lim)


@partial(jax.jit, static_argnames=("out_size",))
def crop_resize_batch(
    padded_u8: jnp.ndarray,
    orig_hw: jnp.ndarray,
    boxes_norm: jnp.ndarray,
    out_size: int | Tuple[int, int] = 64,
):
    """Gather N normalized-xyxy boxes into N [out_h,out_w,3] patches.

    Device-side replacement for the reference's per-crop host loop
    (util/utils.py:87-93: int-truncated crop then cv2.resize INTER_LINEAR).
    Semantics matched: integer crop bounds via trunc, half-pixel-centre
    bilinear sampling, edge clamp inside the crop.

    out_size: int (square) or (out_h, out_w) — e.g. OCR line crops.
    Returns float32 patches in [0,255] (caller normalizes per model).
    """
    out_h, out_w = (out_size, out_size) if isinstance(out_size, int) else out_size
    img = padded_u8.astype(jnp.float32)
    img_h, img_w = padded_u8.shape[0], padded_u8.shape[1]
    xs, ys = jax.vmap(
        lambda b: resize_grid(b, orig_hw, (out_h, out_w)))(boxes_norm)
    return jax.vmap(
        lambda x, y: _bilinear_gather(img, x, y, img_h, img_w))(xs, ys)


def resize_grid(box, orig_hw, out_hw):
    """Anisotropic-stretch sample grid for one normalized box: returns
    (xs [out_w], ys [out_h]) source pixel centers.  Shared between the
    gather path above and ops/mxu_crop's matmul path so both sample
    identically."""
    out_h, out_w = out_hw
    h = orig_hw[0].astype(jnp.float32)
    w = orig_hw[1].astype(jnp.float32)
    x1 = jnp.trunc(box[0] * w)
    y1 = jnp.trunc(box[1] * h)
    x2 = jnp.trunc(box[2] * w)
    y2 = jnp.trunc(box[3] * h)
    cw = jnp.maximum(x2 - x1, 1.0)
    ch = jnp.maximum(y2 - y1, 1.0)
    # cv2.resize half-pixel centers: src = (dst + 0.5) * (crop/out) - 0.5.
    # Clamp relative coords to [0, cw-1] BEFORE the x1 shift: for
    # degenerate boxes (trunc width < 1, cw clamped to 1) a clip bound of
    # x2-1 < x1 would sample outside the box (and diverge from
    # pallas_crop's sampling).
    js = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (cw / out_w) - 0.5
    is_ = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (ch / out_h) - 0.5
    xs = x1 + jnp.clip(js, 0.0, jnp.maximum(cw - 1.0, 0.0))
    ys = y1 + jnp.clip(is_, 0.0, jnp.maximum(ch - 1.0, 0.0))
    # also clamp into the valid (unpadded) image region
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    return xs, ys


def _bilinear_gather(img, xs, ys, img_h, img_w):
    """Sample img at the outer product of ys[rows] x xs[cols], bilinear."""
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[None, :, None]
    fy = (ys - y0)[:, None, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, img_w - 1)
    x1i = jnp.clip(x0i + 1, 0, img_w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, img_h - 1)
    y1i = jnp.clip(y0i + 1, 0, img_h - 1)

    # 4-neighbor gather: rows then columns keeps gathers small & fusable
    top = img[y0i][:, x0i] * (1 - fx) + img[y0i][:, x1i] * fx
    bot = img[y1i][:, x0i] * (1 - fx) + img[y1i][:, x1i] * fx
    return top * (1 - fy) + bot * fy


@partial(jax.jit, static_argnames=("out_hw",))
def crop_lines_batch(
    padded_u8: jnp.ndarray,
    orig_hw: jnp.ndarray,
    boxes_norm: jnp.ndarray,
    out_hw: Tuple[int, int] = (32, 320),
):
    """Gather N text-line boxes into N [out_h,out_w,3] crops, preserving
    aspect ratio (unlike crop_resize_batch's anisotropic stretch).

    OCR-specific sampling: one isotropic scale s = max(ch/out_h, cw/out_w)
    so glyphs are never stretched; the line is top-left anchored
    horizontally (text reads left to right), vertically centred, and
    out-of-crop samples clamp to the crop edge (background replicate —
    CTC-friendly trailing padding).  The recognizer is trained through
    THIS function (train/synth_text.py), so train and inference see
    identical geometry.  Replaces the easyocr/paddle host line pipeline
    (reference util/utils.py:504-540 feeds full-resolution sub-images).
    """
    out_h, out_w = out_hw
    img = padded_u8.astype(jnp.float32)
    img_h, img_w = padded_u8.shape[0], padded_u8.shape[1]
    xs, ys = jax.vmap(
        lambda b: line_grid(b, orig_hw, (out_h, out_w)))(boxes_norm)
    return jax.vmap(
        lambda x, y: _bilinear_gather(img, x, y, img_h, img_w))(xs, ys)


def line_grid(box, orig_hw, out_hw):
    """Isotropic line-crop sample grid for one normalized box: returns
    (xs [out_w], ys [out_h]).  Shared with ops/mxu_crop (see resize_grid)."""
    out_h, out_w = out_hw
    h = orig_hw[0].astype(jnp.float32)
    w = orig_hw[1].astype(jnp.float32)
    x1 = jnp.trunc(box[0] * w)
    y1 = jnp.trunc(box[1] * h)
    x2 = jnp.trunc(box[2] * w)
    y2 = jnp.trunc(box[3] * h)
    cw = jnp.maximum(x2 - x1, 1.0)
    ch = jnp.maximum(y2 - y1, 1.0)
    s = jnp.maximum(ch / out_h, cw / out_w)
    # vertical: centre the ch/s used rows inside out_h
    off_y = (out_h - ch / s) / 2.0
    is_ = ((jnp.arange(out_h, dtype=jnp.float32) - off_y) + 0.5) * s - 0.5
    js = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * s - 0.5
    ys = y1 + jnp.clip(is_, 0.0, jnp.maximum(ch - 1.0, 0.0))
    xs = x1 + jnp.clip(js, 0.0, jnp.maximum(cw - 1.0, 0.0))
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    return xs, ys
