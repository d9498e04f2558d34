"""On-device connected components for the OCR text-detector postprocess.

The reference's OCR engines run their segmentation postprocess on host
(PaddleOCR DBNet C++ post, easyocr CRAFT `getDetBoxes` — behavior surface
at util/utils.py:504-540).  Our round-1 port downloaded the probability
map and ran union-find on host (utils/hostops.py) — on a tunneled TPU
that download (~230 KB + an RTT) sat squarely in the parse latency path
(PERF.md).  This op labels the map on device and returns only per-
component boxes/scores (a few KB), with semantics matched bit-for-bit to
`utils.hostops.extract_components` (4-connectivity, raster order of each
component's first pixel, min_area/min_score filters applied before the
output cap):

  * labeling: iterative min-label propagation — alternating row/column
    *segmented min scans* (`lax.associative_scan`), one `lax.while_loop`
    iteration per "staircase turn" in a component's shape.  GUI text
    blobs are axis-aligned rectangles-ish: 1-3 iterations in practice,
    while the loop is exact for arbitrary shapes.
  * per-component reduction: each pixel's root label is mapped to a
    dense rank slot, then bbox/area/score reduce over a fused
    [H*W, pre_cap] broadcast-compare — no TPU scatter (XLA serializes
    non-unique scatters), no materialized one-hot (XLA fuses the compare
    into the reductions).

Everything is fixed-shape: [pre_cap] raw component slots, compacted to
[max_out] filtered outputs + a count, with dropped-component counters
(no-silent-caps convention).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax


def _seg_min_scan(values: jnp.ndarray, mask: jnp.ndarray, axis: int,
                  reverse: bool, inf: int) -> jnp.ndarray:
    """Min over each contiguous masked run, scanned along `axis`.
    values int32, mask bool; non-mask positions read as `inf` and reset
    the running min (segmented-scan combine: (v, reset) pairs)."""
    v0 = jnp.where(mask, values, inf)
    r0 = ~mask

    def comb(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.minimum(va, vb)), ra | rb

    v, _ = lax.associative_scan(comb, (v0, r0), axis=axis, reverse=reverse)
    return jnp.where(mask, v, inf)


def _propagate_labels(mask: jnp.ndarray, inf: int) -> jnp.ndarray:
    """4-connected min-label propagation to convergence.
    mask: [H, W] bool.  Returns [H, W] int32: each masked pixel holds the
    min flat index of its component (its raster-first pixel); unmasked
    pixels hold `inf`."""
    h, w = mask.shape
    flat = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    init = jnp.where(mask, flat, inf)

    def run_min(l, axis):
        fwd = _seg_min_scan(l, mask, axis, False, inf)
        bwd = _seg_min_scan(l, mask, axis, True, inf)
        return jnp.minimum(fwd, bwd)

    def body(state):
        l, _ = state
        nl = run_min(run_min(l, 1), 0)
        return nl, jnp.any(nl != l)

    def cond(state):
        return state[1]

    labels, _ = lax.while_loop(cond, body, (run_min(run_min(init, 1), 0),
                                            jnp.bool_(True)))
    return labels


@partial(jax.jit, static_argnames=("min_area", "max_out", "pre_cap"))
def device_components(
    prob: jnp.ndarray,
    bin_threshold: jnp.ndarray | float = 0.3,
    min_score: jnp.ndarray | float = 0.3,
    min_area: int = 4,
    max_out: int = 1024,
    pre_cap: int = 1024,
) -> Dict[str, jnp.ndarray]:
    """Connected components of (prob > bin_threshold) with per-component
    stats, matching utils.hostops.extract_components.

    prob: [H, W] float32 in [0, 1] (apply any quantization BEFORE calling
    so device and host-from-downloaded-map paths binarize identically).

    Returns dict of fixed-shape device arrays:
      boxes    [max_out, 4] int32  xyxy, x2/y2 exclusive, raster order
      scores   [max_out] float32   mean prob over component pixels
      areas    [max_out] int32
      count    [] int32            filtered components in `boxes`
      overflow [] int32            components dropped by pre_cap/max_out
    """
    h, w = prob.shape
    inf = h * w
    mask = prob > bin_threshold
    labels = _propagate_labels(mask, inf)

    flatpix = jnp.arange(h * w, dtype=jnp.int32)
    labels_f = labels.ravel()
    mask_f = mask.ravel()
    is_root = mask_f & (labels_f == flatpix)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # [H*W]
    n_roots = jnp.sum(is_root.astype(jnp.int32))

    # per-pixel slot: rank of its component's root (pre_cap = dumping slot)
    dense = jnp.where(is_root & (rank < pre_cap), rank, pre_cap)
    dense = jnp.concatenate([dense, jnp.full((1,), pre_cap, dense.dtype)])
    slots = dense[jnp.minimum(labels_f, inf)]  # [H*W] in [0, pre_cap]

    # fused broadcast-compare reductions over pre_cap slots
    sid = jnp.arange(pre_cap, dtype=jnp.int32)
    eq = slots[:, None] == sid[None, :]  # fused into each reduce below
    xs = (flatpix % w)[:, None]
    ys = (flatpix // w)[:, None]
    big = jnp.int32(inf)
    x1 = jnp.min(jnp.where(eq, xs, big), axis=0)
    y1 = jnp.min(jnp.where(eq, ys, big), axis=0)
    x2 = jnp.max(jnp.where(eq, xs, -1), axis=0)
    y2 = jnp.max(jnp.where(eq, ys, -1), axis=0)
    area = jnp.sum(eq, axis=0, dtype=jnp.int32)
    psum = jnp.sum(jnp.where(eq, prob.ravel()[:, None], 0.0), axis=0,
                   dtype=jnp.float32)
    score = psum / jnp.maximum(area, 1)

    occupied = area > 0
    keep = occupied & (area >= min_area) & (score >= min_score)

    # compact filtered components (raster order preserved: slot order IS
    # root raster order) into max_out output slots
    out_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep & (out_rank < max_out), out_rank, max_out)
    boxes_all = jnp.stack([x1, y1, x2 + 1, y2 + 1], axis=1)
    boxes = jnp.zeros((max_out + 1, 4), jnp.int32).at[dest].set(
        boxes_all, mode="drop")[:max_out]
    scores = jnp.zeros((max_out + 1,), jnp.float32).at[dest].set(
        score, mode="drop")[:max_out]
    areas = jnp.zeros((max_out + 1,), jnp.int32).at[dest].set(
        area, mode="drop")[:max_out]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    count = jnp.minimum(n_keep, max_out)
    overflow = (n_keep - count) + jnp.maximum(n_roots - pre_cap, 0)
    return {"boxes": boxes, "scores": scores, "areas": areas,
            "count": count.astype(jnp.int32),
            "overflow": overflow.astype(jnp.int32)}


def quantize_u8_parity(prob: jnp.ndarray) -> jnp.ndarray:
    """Apply the uint8 download quantization on device so binarize/score
    thresholds see exactly the values the host path would (models/ocr.py
    quantizes the map to uint8 for the tunnel; CC must match either way)."""
    q = jnp.floor(jnp.clip(prob, 0.0, 1.0) * 255.0 + 0.5)
    return q / 255.0
