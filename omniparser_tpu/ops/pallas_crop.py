"""Pallas crop-gather: N boxes -> N [S, S, 3] patches, HBM-resident image.

The north-star preprocessing kernel (BASELINE.json: "crop-gather as Pallas
kernel"): the screenshot stays in HBM in planar [3, H, W] layout; each grid
program owns one box, DMAs an 8-aligned 16-row band per output row into
VMEM (TPU f32 memrefs tile (8, 128): sublane slices must be 8-aligned, and
a trailing RGB dim of 3 would be un-DMA-able — hence planar + bands), and
does the column interpolation as an [S, W] x [W, 1] matmul on the MXU with
a per-box two-hot bilinear weight matrix built once.

Matches ops/preprocess.crop_resize_batch's sampling semantics exactly
(int-truncated crop bounds, half-pixel centers, edge clamp) — see
tests/test_pallas_crop.py.  The XLA gather version remains the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q = 65536.0  # Q16 fixed point for floats carried through int32 SMEM


def _build_meta(boxes_norm, orig_hw):
    """[N, 6] int32 SMEM meta: x1, cw_q16, y1, ch_q16, h, (pad)."""
    h = orig_hw[0].astype(jnp.float32)
    w = orig_hw[1].astype(jnp.float32)
    x1 = jnp.trunc(boxes_norm[:, 0] * w)
    y1 = jnp.trunc(boxes_norm[:, 1] * h)
    x2 = jnp.trunc(boxes_norm[:, 2] * w)
    y2 = jnp.trunc(boxes_norm[:, 3] * h)
    cw = jnp.maximum(x2 - x1, 1.0)
    ch = jnp.maximum(y2 - y1, 1.0)
    x1 = jnp.clip(x1, 0.0, jnp.maximum(w - 1.0, 0.0))
    y1 = jnp.clip(y1, 0.0, jnp.maximum(h - 1.0, 0.0))
    n = boxes_norm.shape[0]
    return jnp.stack(
        [
            x1.astype(jnp.int32),
            (cw * _Q).astype(jnp.int32),
            y1.astype(jnp.int32),
            (ch * _Q).astype(jnp.int32),
            jnp.full((n,), orig_hw[0], jnp.int32),
            jnp.zeros((n,), jnp.int32),
        ],
        axis=1,
    )


def _crop_kernel(meta_ref, img_ref, out_ref, wcols, band, sems):
    s = out_ref.shape[2]
    img_h = img_ref.shape[1]
    wb = img_ref.shape[2]
    i = pl.program_id(0)

    x1 = meta_ref[i, 0].astype(jnp.float32)
    cw = meta_ref[i, 1].astype(jnp.float32) / _Q
    y1 = meta_ref[i, 2].astype(jnp.float32)
    ch = meta_ref[i, 3].astype(jnp.float32) / _Q
    h_f = meta_ref[i, 4].astype(jnp.float32)

    # per-box column weights [S, Wb] (shared by all output rows)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (s, wb), 0).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, wb), 1).astype(jnp.float32)
    xs = (j_ids + 0.5) * (cw / s) - 0.5
    xs = jnp.clip(xs, 0.0, jnp.maximum(cw - 1.0, 0.0)) + x1
    xs = jnp.clip(xs, 0.0, wb - 1.0)
    x0 = jnp.floor(xs)
    fx = xs - x0
    w0 = jnp.where(col_ids == x0, 1.0 - fx, 0.0)
    w1 = jnp.where(col_ids == x0 + 1.0, fx, 0.0)
    edge = jnp.where((col_ids == x0) & (x0 + 1.0 > wb - 1.0), fx, 0.0)
    wcols[:] = w0 + w1 + edge

    def row_body(r, _):
        # scalar sampling math (mirrors crop_resize_batch)
        ys = (r.astype(jnp.float32) + 0.5) * (ch / s) - 0.5
        ys = jnp.clip(ys, 0.0, jnp.maximum(ch - 1.0, 0.0)) + y1
        ys = jnp.minimum(ys, h_f - 1.0)
        y0f = jnp.floor(ys)
        fy = ys - y0f
        y0 = jnp.minimum(y0f.astype(jnp.int32), img_h - 2)
        fy = jnp.where(y0f.astype(jnp.int32) > img_h - 2, 1.0, fy)
        # 8-aligned 16-row band containing y0 and y0+1 (img_h is a multiple
        # of 8 — raw buckets are 128-multiples); hint Mosaic about alignment
        y_blk = pl.multiple_of(jnp.clip((y0 // 8) * 8, 0, img_h - 16), 8)
        off = y0 - y_blk

        copies = [
            pltpu.make_async_copy(
                img_ref.at[c, pl.ds(y_blk, 16)], band.at[c], sems.at[c]
            )
            for c in range(3)
        ]
        for cp in copies:
            cp.start()
        for c, cp in enumerate(copies):
            cp.wait()
            top = jax.lax.dot_general(
                wcols[:], band[c, pl.ds(off, 1), :].T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, 1]
            bot = jax.lax.dot_general(
                wcols[:], band[c, pl.ds(off + 1, 1), :].T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, c, pl.ds(r, 1), :] = ((1.0 - fy) * top + fy * bot).T
        return 0

    jax.lax.fori_loop(0, s, row_body, 0)


@partial(jax.jit, static_argnames=("out_size", "interpret"))
def pallas_crop_resize(padded_u8, orig_hw, boxes_norm, out_size: int = 64,
                       interpret: bool = False):
    """Pallas counterpart of crop_resize_batch (square out_size only)."""
    n = boxes_norm.shape[0]
    img_h, img_w = padded_u8.shape[0], padded_u8.shape[1]
    meta = _build_meta(boxes_norm, orig_hw)
    img = padded_u8.astype(jnp.float32).transpose(2, 0, 1)  # planar [3, H, W]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 3, out_size, out_size), lambda i, meta: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((out_size, img_w), jnp.float32),
            pltpu.VMEM((3, 16, img_w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    out = pl.pallas_call(
        _crop_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(meta, img)
    return out.transpose(0, 2, 3, 1)
