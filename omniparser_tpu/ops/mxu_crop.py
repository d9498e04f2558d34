"""Crop-resize as MXU matmuls: the fused parse step's crop gathers,
reformulated so the FLOPs ride the systolic array instead of XLA's
scalar gather path.

Motivation (measured on the tunneled v5e, 2048x2048 frame): the
gather-based `crop_lines_batch` costs ~330 ms at 256 slots and ~30 ms at
64 — XLA lowers the 4-tap bilinear gather to ~66M taps/s, making crops
the dominant slice of the fused device step and forcing aggressive slot
bucketing.  This module extracts the same 4 bilinear taps with one-hot
interpolation matmuls over a dynamically-sliced row band:

    band  = dynamic_slice(img_planar, rows around the box)   # DMA, no gather
    top   = RT @ band        RT/RB: [out_h, band_h] one-hot row selectors
    p00   = top @ CL         CL/CR: [W, out_w] one-hot column selectors
    out   = bilinear-combine(p00, p01, p10, p11)             # fp32, exact

Exactness: uint8 pixel values (<= 255) and one-hot weights are exact in
bfloat16, and the matmuls accumulate in fp32, so every tap equals the
gathered value bit-for-bit; the combine uses the same expression tree as
`ops.preprocess._bilinear_gather`.  Boxes whose sampled rows span more
than the row band (taller than ~band_h px) take a per-crop gather
fallback inside the `lax.scan` (`lax.cond` — the scan is not vmapped, so
only the taken branch executes), keeping the function a drop-in
replacement for all inputs.

The sample grids come from `preprocess.resize_grid`/`line_grid` — the
single source of truth for crop geometry (the recognizer/captioner were
trained through those grids).

Reference analogue: util/utils.py:87-93 (host per-crop cv2.resize loop).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from omniparser_tpu.ops.preprocess import line_grid, resize_grid

# row-band heights (bounded VMEM/HBM traffic per crop; boxes taller than
# the band take the exact gather fallback).  OCR text lines are almost
# always < 128 px at upload resolution; icon crops < 256 px.
LINE_BAND = 128
RESIZE_BAND = 256


def _scan_sample(padded_u8: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                 band_h: int) -> jnp.ndarray:
    """Sample [N, out_h, out_w, 3] fp32 crops at the outer-product grids
    xs [N, out_w], ys [N, out_h] (pixel centers, already clamped)."""
    img_h, img_w = padded_u8.shape[0], padded_u8.shape[1]
    bh = min(band_h, img_h)
    out_h, out_w = ys.shape[1], xs.shape[1]
    # planar [3, H, W] so the row band is one contiguous dynamic_slice per
    # plane; bf16 is exact for uint8 values
    img_p = padded_u8.astype(jnp.bfloat16).transpose(2, 0, 1)

    col_iota = jnp.arange(img_w, dtype=jnp.int32)
    row_iota = jnp.arange(bh, dtype=jnp.int32)

    def one(_, grid):
        gx, gy = grid  # [out_w], [out_h]
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = (gx - x0)[None, None, :]  # [1, 1, out_w] (planar layout)
        fy = (gy - y0)[None, :, None]  # [1, out_h, 1]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, img_w - 1)
        x1i = jnp.clip(x0i + 1, 0, img_w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, img_h - 1)
        y1i = jnp.clip(y0i + 1, 0, img_h - 1)

        lo = jnp.min(y0i)
        fits = (jnp.max(y1i) - lo + 1) <= bh

        def mxu():
            bs = jnp.clip(lo, 0, img_h - bh)
            band = jax.lax.dynamic_slice(img_p, (0, bs, 0), (3, bh, img_w))
            rt = (row_iota[None, :] == (y0i - bs)[:, None]).astype(jnp.bfloat16)
            rb = (row_iota[None, :] == (y1i - bs)[:, None]).astype(jnp.bfloat16)
            # [out_h, bh] @ [3, bh, W] -> [3, out_h, W]; integer-valued, so
            # the bf16 round-trip into the column matmuls is exact
            top = jnp.einsum("ob,cbw->cow", rt, band,
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            bot = jnp.einsum("ob,cbw->cow", rb, band,
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            cl = (col_iota[:, None] == x0i[None, :]).astype(jnp.bfloat16)
            cr = (col_iota[:, None] == x1i[None, :]).astype(jnp.bfloat16)
            p00, p01, p10, p11 = (
                jnp.einsum("cow,wm->com", t, c,
                           preferred_element_type=jnp.float32)
                for t, c in ((top, cl), (top, cr), (bot, cl), (bot, cr))
            )
            # same expression tree as _bilinear_gather => bitwise-equal fp32
            t_ = p00 * (1 - fx) + p01 * fx
            b_ = p10 * (1 - fx) + p11 * fx
            return t_ * (1 - fy) + b_ * fy

        def gather():
            take = padded_u8[y0i][:, x0i].astype(jnp.float32)
            tr = padded_u8[y0i][:, x1i].astype(jnp.float32)
            bl = padded_u8[y1i][:, x0i].astype(jnp.float32)
            br = padded_u8[y1i][:, x1i].astype(jnp.float32)
            fxg = fx.transpose(1, 2, 0)  # [1, out_w, 1] (NHWC layout)
            fyg = fy.transpose(1, 2, 0)  # [out_h, 1, 1]
            t_ = take * (1 - fxg) + tr * fxg
            b_ = bl * (1 - fxg) + br * fxg
            return (t_ * (1 - fyg) + b_ * fyg).transpose(2, 0, 1)

        return None, jax.lax.cond(fits, mxu, gather)

    _, out = jax.lax.scan(one, None, (xs, ys))
    return out.transpose(0, 2, 3, 1)  # [N, out_h, out_w, 3]


@partial(jax.jit, static_argnames=("out_size", "band_h"))
def crop_resize_mxu(padded_u8, orig_hw, boxes_norm,
                    out_size: int | Tuple[int, int] = 64,
                    band_h: int = RESIZE_BAND):
    """Drop-in `crop_resize_batch` (anisotropic stretch) on the MXU."""
    out_hw = (out_size, out_size) if isinstance(out_size, int) else out_size
    xs, ys = jax.vmap(lambda b: resize_grid(b, orig_hw, out_hw))(boxes_norm)
    return _scan_sample(padded_u8, xs, ys, band_h)


@partial(jax.jit, static_argnames=("out_hw", "band_h"))
def crop_lines_mxu(padded_u8, orig_hw, boxes_norm,
                   out_hw: Tuple[int, int] = (32, 320),
                   band_h: int = LINE_BAND):
    """Drop-in `crop_lines_batch` (isotropic OCR lines) on the MXU."""
    xs, ys = jax.vmap(lambda b: line_grid(b, orig_hw, out_hw))(boxes_norm)
    return _scan_sample(padded_u8, xs, ys, band_h)
