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


def candidate_boxes_from_cc(
    cc_boxes: jnp.ndarray,
    cc_count: jnp.ndarray,
    r: jnp.ndarray,
    pad_yx: jnp.ndarray,
    hw: jnp.ndarray,
    max_boxes: int,
    scale: int = 2,
    unclip: float = 2.0,
):
    """Device half of the OCR candidate postprocess: component boxes at
    det-map scale -> normalized text-line candidate boxes in the uploaded
    frame, entirely on device.

    Traceable twin of models/ocr.candidates_from_prob's unclip + letterbox
    unmap + min-size filter (candidate_boxes_np below is the shared-math
    numpy restatement both paths are tested against).  Feeding this into
    the fused parse step removes the component download + host loop from
    the latency path: the parse becomes dispatch -> dispatch -> ONE
    download (pipeline.py module docstring).

    cc_boxes: [C, 4] int32 xyxy at det-map scale (x2/y2 exclusive),
    raster order (device_components output).  cc_count: [] int32.
    r / pad_yx: letterbox scale + (pad_y, pad_x), fp32 (closed-form host
    math — models/ocr.dispatch_det).  hw: [2] int32 uploaded frame dims.

    Returns (boxes_norm [max_boxes, 4] fp32, valid [max_boxes] bool,
    overflow [] int32 — candidates dropped by the max_boxes cap).
    All arithmetic fp32, matching the (harmonized) host path bit-for-bit.
    """
    b = cc_boxes[:max_boxes].astype(jnp.float32)
    n = jnp.minimum(cc_count, max_boxes)
    valid = jnp.arange(max_boxes, dtype=jnp.int32) < n
    wc = b[:, 2] - b[:, 0]
    hc = b[:, 3] - b[:, 1]
    # unclip margin is a multiple of 0.5 and *scale makes every corner an
    # exact integer — rounding mode can't matter (see candidate_boxes_np)
    margin = jnp.float32((unclip - 1.0) * 0.5) * jnp.minimum(wc, hc)
    s = jnp.float32(scale)
    x1 = jnp.round((b[:, 0] - margin) * s)
    y1 = jnp.round((b[:, 1] - margin) * s)
    x2 = jnp.round((b[:, 2] + margin) * s)
    y2 = jnp.round((b[:, 3] + margin) * s)
    r32 = jnp.asarray(r, jnp.float32)
    py = jnp.asarray(pad_yx[0], jnp.float32)
    px = jnp.asarray(pad_yx[1], jnp.float32)
    fh = hw[0].astype(jnp.float32)
    fw = hw[1].astype(jnp.float32)
    bx1 = jnp.maximum((x1 - px) / r32, 0.0)
    by1 = jnp.maximum((y1 - py) / r32, 0.0)
    bx2 = jnp.minimum((x2 - px) / r32, fw)
    by2 = jnp.minimum((y2 - py) / r32, fh)
    ok = valid & (bx2 - bx1 >= 1.0) & (by2 - by1 >= 1.0)
    ib = jnp.stack(  # int() truncation parity (coords are >= 0)
        [jnp.floor(bx1), jnp.floor(by1), jnp.floor(bx2), jnp.floor(by2)], axis=1
    )
    norm = ib / jnp.stack([fw, fh, fw, fh])
    norm = jnp.where(ok[:, None], norm, 0.0)
    overflow = jnp.maximum(cc_count - max_boxes, 0)
    return norm, ok, overflow.astype(jnp.int32)


def candidate_boxes_np(comps, r, pads, w: int, h: int,
                       scale: int = 2, unclip: float = 2.0):
    """Numpy fp32 restatement of candidate_boxes_from_cc for the HOST
    candidate path — [(box_xyxy, score)] component list at det-map scale ->
    compacted [x1, y1, x2, y2] int pixel boxes in the uploaded frame.

    Both paths intentionally share operation order and fp32 precision so
    their int-truncated outputs are bit-identical (the unmap divides by a
    letterbox ratio; float64-vs-float32 could truncate knife-edge values
    to different integers)."""
    import numpy as np

    if not comps:
        return []
    b = np.asarray([c[0] for c in comps], np.float32).reshape(-1, 4)
    wc = b[:, 2] - b[:, 0]
    hc = b[:, 3] - b[:, 1]
    margin = np.float32((unclip - 1.0) * 0.5) * np.minimum(wc, hc)
    s = np.float32(scale)
    x1 = np.round((b[:, 0] - margin) * s)
    y1 = np.round((b[:, 1] - margin) * s)
    x2 = np.round((b[:, 2] + margin) * s)
    y2 = np.round((b[:, 3] + margin) * s)
    r32 = np.float32(r)
    py, px = np.float32(pads[0]), np.float32(pads[1])
    bx1 = np.maximum((x1 - px) / r32, np.float32(0.0))
    by1 = np.maximum((y1 - py) / r32, np.float32(0.0))
    bx2 = np.minimum((x2 - px) / r32, np.float32(w))
    by2 = np.minimum((y2 - py) / r32, np.float32(h))
    ok = (bx2 - bx1 >= 1.0) & (by2 - by1 >= 1.0)
    ib = np.stack([bx1, by1, bx2, by2], axis=1).astype(np.int64)
    return [list(int(v) for v in row) for row in ib[ok]]
