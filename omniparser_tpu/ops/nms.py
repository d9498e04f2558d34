"""Fixed-shape greedy NMS, fully on device.

The reference delegates NMS to ultralytics/torchvision's CUDA kernel
(util/utils.py:378-399 -> ultralytics model.predict(iou=...)).  Here it is a
jit-compiled greedy pass over a static number of slots: sort once by score,
then a `lax.fori_loop` that masks out later boxes overlapping each surviving
box.  Exact greedy semantics (identical keep-set to torchvision.ops.nms),
static shapes, no host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from omniparser_tpu.ops.boxes import box_area, pairwise_intersection


def _plain_pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """Symmetric IoU without the containment ratios (torchvision semantics)."""
    inter = pairwise_intersection(boxes, boxes)
    area = box_area(boxes)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union == 0, 1.0, union), 0.0)


def _select_max_keep(sboxes, svalid, iou_threshold, max_out):
    """Greedy NMS as max_out select-max steps over score-sorted slots.

    Equivalent keep-set to the full greedy pass truncated to its top
    max_out survivors, but sequential length max_out (not N) and O(N)
    memory (no N x N IoU matrix) — the shape used for large prefilter
    windows (DetectorConfig.prefilter_topk > 1024), where the reference's
    unbounded ultralytics NMS must be matched without a 4096^2 matrix.

    Inputs are score-sorted descending with padding slots invalid; the
    running argmin over available positions therefore visits boxes in
    exactly the order the sorted greedy loop would.
    """
    n = sboxes.shape[0]
    pos = jnp.arange(n)
    area = box_area(sboxes)

    def body(_, carry):
        avail, keep = carry
        # first still-available slot == highest-scoring remaining box
        i = jnp.argmax(avail)
        ok = avail[i]
        bi = sboxes[i]
        lt = jnp.maximum(bi[:2], sboxes[:, :2])
        rb = jnp.minimum(bi[2:], sboxes[:, 2:])
        inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)
        union = area[i] + area - inter
        iou = jnp.where(union > 0, inter / jnp.where(union == 0, 1.0, union), 0.0)
        suppress = (iou > iou_threshold) & avail
        # .max, not .set: once every slot is exhausted argmax returns 0,
        # and ok=False must not clobber an already-kept slot 0
        keep = keep.at[i].max(ok)
        avail = avail & ~suppress & (pos != i)
        return avail, keep

    _, keep = jax.lax.fori_loop(
        0, max_out, body, (svalid, jnp.zeros((n,), jnp.bool_))
    )
    return keep


@partial(jax.jit, static_argnames=("max_out", "allow_pallas"))
def nms_fixed_shape(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: jnp.ndarray | float,
    max_out: int,
    allow_pallas: bool = True,
):
    """Greedy NMS over fixed slots.

    Args:
      boxes: [N, 4] xyxy (any scale).
      scores: [N] confidences.
      valid: [N] bool — padding slots must be False.
      iou_threshold: suppress j if IoU(i, j) > threshold for a kept,
        higher-scoring i (strict >, matching torchvision).
      max_out: static output slot count.

    Returns:
      (boxes [max_out,4], scores [max_out], indices [max_out] into the input,
       keep_valid [max_out] bool), score-sorted descending, padded with zeros.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]

    from omniparser_tpu.ops.pallas_kernels import pallas_nms_keep, use_pallas

    # the kernel holds the full N x N fp32 IoU matrix in VMEM (~16 MB/core):
    # N=1024 -> 4 MB fits; N=2048 -> 16.8 MB does not.  Callers that vmap
    # this function pass allow_pallas=False (Mosaic kernels don't batch).
    if allow_pallas and use_pallas() and n <= 1024:
        # single-kernel greedy pass: IoU matrix + suppression scan in VMEM
        keep = pallas_nms_keep(sboxes, svalid, iou_threshold)
    elif n > 1024:
        # large prefilter windows: O(N) memory, max_out sequential steps
        keep = _select_max_keep(sboxes, svalid, iou_threshold, max_out)
    else:
        iou = _plain_pairwise_iou(sboxes)
        pos = jnp.arange(n)

        def body(i, keep):
            # If slot i survives, kill every later slot overlapping it.
            overlap_later = (iou[i] > iou_threshold) & (pos > i)
            return jnp.where(keep[i] & overlap_later, False, keep)

        keep = jax.lax.fori_loop(0, n, body, svalid)

    # Compact the kept slots to the front (stable: score order preserved).
    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, rank, max_out)  # dropped slots scatter out of range
    out_boxes = jnp.zeros((max_out, 4), boxes.dtype).at[dest].set(sboxes, mode="drop")
    out_scores = jnp.zeros((max_out,), scores.dtype).at[dest].set(
        masked_scores[order], mode="drop"
    )
    out_idx = jnp.zeros((max_out,), jnp.int32).at[dest].set(order.astype(jnp.int32), mode="drop")
    out_valid = jnp.zeros((max_out,), jnp.bool_).at[dest].set(keep, mode="drop")
    return out_boxes, out_scores, out_idx, out_valid
