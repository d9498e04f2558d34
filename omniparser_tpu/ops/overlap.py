"""Vectorized overlap suppression + OCR/icon merge.

This is the fixed-shape, on-device replacement for the reference's
``remove_overlap_new`` (util/utils.py:231-309) — an O(n^2 * m) pure-Python
triple loop that is one of the three hot host loops on the serving path
(SURVEY.md §3.1).  The loop looks order-dependent (it mutates the output
list while scanning), but its *decisions* are all geometric and
order-independent:

  * an icon is suppressed iff some other icon has
    max-overlap-ratio > iou_threshold and strictly smaller area
    (util/utils.py:270-278; the scan is over the original list, so later-
    suppressed icons still suppress);
  * for a surviving icon, OCR boxes are scanned in their original order:
      - an OCR box >80%-inside the icon donates its text to the icon's
        content and is removed from the output (util/utils.py:287-296;
        note the reference appends the text *before* the possibly-failing
        list.remove, so a box absorbed by an earlier icon still donates
        text again — we reproduce that);
      - the first OCR box that >80%-contains the icon kills the icon and
        stops the scan (util/utils.py:297-299), so only OCR boxes *before*
        that stop index donate text.

So the whole pass reduces to three boolean matrices computed in one XLA
graph; only the final string concatenation happens on host.

Numerics note: thresholds are compared in float32 on device, while the
reference compares in Python float64.  At *exact* threshold ties (e.g. a
containment ratio of precisely 0.80 from grid-aligned pixel boxes) the two
can disagree by one ULP and flip an absorb/keep decision; randomized
float64-oracle fuzzing shows no other divergence class.  This is inherent
to fp32 device math and left as-is.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from omniparser_tpu.ops.boxes import (
    box_area,
    containment_ratio,
    pairwise_max_overlap_ratio,
)

_INSIDE_THRESHOLD = 0.80  # util/utils.py:263


class OverlapResult(NamedTuple):
    """Masks describing the merged element set (all fixed-shape).

    icon_keep:  [N] bool — icon survives suppression and is not inside OCR.
    ocr_keep:   [M] bool — OCR box is valid and was not absorbed by an icon.
    absorb:     [N, M] bool — absorb[i, k]: OCR k's text joins icon i's
                content (in ascending-k order, space-separated + trailing
                space, matching util/utils.py:292).
    icon_suppressed: [N] bool — dropped by the icon-vs-icon IoU rule.
    """

    icon_keep: jnp.ndarray
    ocr_keep: jnp.ndarray
    absorb: jnp.ndarray
    icon_suppressed: jnp.ndarray


@partial(jax.jit, static_argnames=("allow_pallas",))
def merge_icons_and_ocr(
    icon_boxes: jnp.ndarray,
    icon_valid: jnp.ndarray,
    ocr_boxes: jnp.ndarray,
    ocr_valid: jnp.ndarray,
    iou_threshold: jnp.ndarray | float,
    allow_pallas: bool = True,
) -> OverlapResult:
    """Fixed-shape merge of icon detections with OCR text boxes.

    Args:
      icon_boxes: [N, 4] normalized xyxy; icon_valid: [N] bool (padding False).
      ocr_boxes: [M, 4] normalized xyxy; ocr_valid: [M] bool.
      iou_threshold: icon-vs-icon suppression threshold (server: 0.7).
      allow_pallas: vmapping callers pass False (Mosaic kernels don't batch).
    """
    n = icon_boxes.shape[0]
    m = ocr_boxes.shape[0]

    import os

    from omniparser_tpu.ops.pallas_kernels import pallas_overlap_matrices, use_pallas

    # Opt-in: the fused Pallas kernel is exact-match-verified on TPU but
    # measures slightly slower than XLA's own fusion of these matrices
    # (PERF.md), so XLA stays the default.  VMEM budget: ratio [N,N] +
    # 2x [N,M] int32 must fit comfortably.
    opt_in = os.environ.get("OMNIPARSER_TPU_PALLAS_MERGE", "0") not in ("0", "false")
    if allow_pallas and opt_in and use_pallas() and n * (n + 2 * m) * 4 <= 4 * 2 ** 20:
        ratio, a_geom, b_geom = pallas_overlap_matrices(icon_boxes, ocr_boxes)
        a = a_geom & ocr_valid[None, :]
        b = b_geom & ocr_valid[None, :]
    else:
        ratio = pairwise_max_overlap_ratio(icon_boxes, icon_boxes)  # [N, N]
        # a[i, k]: OCR k sits >80% inside icon i  (is_inside(ocr, icon))
        a = (containment_ratio(ocr_boxes, icon_boxes).T > _INSIDE_THRESHOLD) & ocr_valid[None, :]
        # b[i, k]: icon i sits >80% inside OCR k  (is_inside(icon, ocr))
        b = (containment_ratio(icon_boxes, ocr_boxes) > _INSIDE_THRESHOLD) & ocr_valid[None, :]

    # --- icon-vs-icon suppression (keep the smaller box) ---
    area = box_area(icon_boxes)
    not_self = ~jnp.eye(n, dtype=bool)
    bigger = area[:, None] > area[None, :]
    suppressed_by = not_self & icon_valid[None, :] & (ratio > iou_threshold) & bigger
    icon_suppressed = suppressed_by.any(axis=1) & icon_valid
    icon_pass = icon_valid & ~icon_suppressed

    # the reference's elif only fires when the `a` branch didn't
    b = b & ~a

    ks = jnp.arange(m)
    any_b = b.any(axis=1)
    k_stop = jnp.where(any_b, jnp.argmax(b, axis=1), m)  # first stop index, else m

    absorb = icon_pass[:, None] & a & (ks[None, :] < k_stop[:, None])
    ocr_removed = absorb.any(axis=0)

    icon_keep = icon_pass & ~any_b
    ocr_keep = ocr_valid & ~ocr_removed
    return OverlapResult(icon_keep, ocr_keep, absorb, icon_suppressed)
