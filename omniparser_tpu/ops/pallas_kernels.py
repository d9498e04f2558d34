"""Pallas TPU kernels for the suppression hot path.

Two kernels, both operating on the fixed-shape box arrays of the fused
parse step (see /opt/skills/guides/pallas_guide.md for the programming
model):

  * `pallas_nms_keep` — greedy NMS as ONE kernel: the IoU matrix is
    computed tile-by-tile in VMEM (VPU) and the sequential suppression
    scan runs as a fori_loop over rows against a keep vector held in VMEM,
    so the whole O(N^2) pass costs a single kernel launch and never spills
    the matrix to HBM (N=512 -> 1 MB fp32, well under the ~16 MB VMEM).
  * `pallas_overlap_matrices` — the merge pass's three boolean matrices
    (suppression ratio, OCR-inside-icon, icon-inside-OCR) fused into one
    kernel over the [N, M] pair grid.

Both have exact-match tests against the XLA reference implementations
(tests/test_pallas.py, interpret mode on CPU; compiled on TPU).  The XLA
paths remain the default off-TPU; `use_pallas()` picks automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INSIDE_THRESHOLD = 0.80  # util/utils.py:263
_UNION_EPS = 1e-6


def use_pallas() -> bool:
    import os

    env = os.environ.get("OMNIPARSER_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


# ------------------------------------------------------------------ #
# Greedy NMS
# ------------------------------------------------------------------ #


def _nms_kernel(boxes_ref, valid_ref, thr_ref, keep_ref, iou_scratch):
    """boxes_ref: [N, 4] score-sorted desc; valid_ref: [1, N] int32 (bool);
    thr_ref: [1, 1] in SMEM; keep_ref out [1, N] int32; iou_scratch [N, N].

    Layout note: the suppression scan slices row i of the (symmetric) IoU
    matrix — a sublane slice, which Mosaic allows at any offset (lane-dim
    slices must be 128-aligned), so the keep vector lives as [1, N].
    """
    boxes = boxes_ref[:]
    n = boxes.shape[0]

    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)  # [N, 1]

    iw = jnp.maximum(jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
    ih = jnp.maximum(jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = iw * ih
    union = area + area.T - inter
    iou_scratch[:] = jnp.where(union > 0, inter / jnp.where(union == 0, 1.0, union), 0.0)

    thr = thr_ref[0, 0]
    keep_ref[:] = valid_ref[:]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, _):
        # if box i survives, kill every later box overlapping it.  keep[i]
        # is extracted as a one-hot reduction to stay in vector registers
        # (dynamic scalar reads from VMEM would round-trip through SMEM).
        keep_i = jnp.sum(keep_ref[:] * (col_ids == i), axis=1, keepdims=True)  # [1,1]
        row = iou_scratch[pl.ds(i, 1), :]  # [1, N] — row i == column i (symmetric)
        suppress = (row > thr) & (col_ids > i) & (keep_i > 0)
        keep_ref[:] = jnp.where(suppress, 0, keep_ref[:])
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_nms_keep(sorted_boxes, sorted_valid, iou_threshold, interpret=False):
    """Keep mask for score-sorted boxes — the core of nms_fixed_shape.

    sorted_boxes [N, 4] float32 (descending score), sorted_valid [N] bool.
    Returns keep [N] bool with exact torchvision greedy semantics.
    """
    n = sorted_boxes.shape[0]
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=interpret,
    )(
        sorted_boxes.astype(jnp.float32),
        sorted_valid.astype(jnp.int32)[None, :],
        jnp.asarray(iou_threshold, jnp.float32).reshape(1, 1),
    )
    return keep[0] > 0


# ------------------------------------------------------------------ #
# Merge matrices
# ------------------------------------------------------------------ #


def _overlap_kernel(icon_ref, ocr_ref, suppress_ref, a_ref, b_ref):
    """icon_ref [N,4], ocr_ref [M,4] ->
    suppress_ref [N,N] int32 (ratio>thr & area_i>area_j is computed by the
    caller from the returned ratio — here we emit the full max-overlap
    ratio), a_ref [N,M] (ocr>80% inside icon), b_ref [N,M] (icon>80% in ocr).
    """
    ic = icon_ref[:]
    oc = ocr_ref[:]

    ix1, iy1, ix2, iy2 = ic[:, 0:1], ic[:, 1:2], ic[:, 2:3], ic[:, 3:4]
    iarea = (ix2 - ix1) * (iy2 - iy1)

    # icon-vs-icon max overlap ratio
    iw = jnp.maximum(jnp.minimum(ix2, ix2.T) - jnp.maximum(ix1, ix1.T), 0.0)
    ih = jnp.maximum(jnp.minimum(iy2, iy2.T) - jnp.maximum(iy1, iy1.T), 0.0)
    inter = iw * ih
    union = iarea + iarea.T - inter + _UNION_EPS
    iou = inter / union
    both = (iarea > 0) & (iarea.T > 0)
    safe_i = jnp.where(iarea == 0, 1.0, iarea)
    r1 = jnp.where(both, inter / safe_i, 0.0)
    r2 = jnp.where(both, inter / safe_i.T, 0.0)
    suppress_ref[:] = jnp.maximum(iou, jnp.maximum(r1, r2))

    # icon-vs-ocr containment ratios
    ox1, oy1, ox2, oy2 = oc[:, 0:1], oc[:, 1:2], oc[:, 2:3], oc[:, 3:4]
    oarea = ((ox2 - ox1) * (oy2 - oy1)).T  # [1, M]
    w2 = jnp.maximum(jnp.minimum(ix2, ox2.T) - jnp.maximum(ix1, ox1.T), 0.0)
    h2 = jnp.maximum(jnp.minimum(iy2, oy2.T) - jnp.maximum(iy1, oy1.T), 0.0)
    inter2 = w2 * h2  # [N, M]
    a_ref[:] = jnp.where(
        (oarea > 0) & (inter2 / jnp.where(oarea == 0, 1.0, oarea) > _INSIDE_THRESHOLD), 1, 0
    )
    b_ref[:] = jnp.where(
        (iarea > 0) & (inter2 / jnp.where(iarea == 0, 1.0, iarea) > _INSIDE_THRESHOLD), 1, 0
    )


@partial(jax.jit, static_argnames=("interpret",))
def pallas_overlap_matrices(icon_boxes, ocr_boxes, interpret=False):
    """One kernel -> (ratio [N,N] f32, a [N,M] bool, b [N,M] bool)."""
    n, m = icon_boxes.shape[0], ocr_boxes.shape[0]
    ratio, a, b = pl.pallas_call(
        _overlap_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, m), jnp.int32),
            jax.ShapeDtypeStruct((n, m), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(icon_boxes.astype(jnp.float32), ocr_boxes.astype(jnp.float32))
    return ratio, a > 0, b > 0
