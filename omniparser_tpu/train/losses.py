"""Detection + caption losses (pure JAX, fixed shapes).

Detection follows the YOLOv8 loss family — BCE classification, CIoU box
regression, Distribution Focal Loss on the ltrb bins — with a simplified
center-inside assigner (each anchor is positive for the smallest GT box
containing its center) instead of ultralytics' task-aligned assigner; the
loss is documented as such and is a faithful trainable objective, not a
bitwise port.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from omniparser_tpu.models.yolov8 import REG_MAX, STRIDES


def _anchor_centers(imgsz: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All anchor centers (normalized) + per-anchor stride, level-concatenated."""
    centers, strides = [], []
    for s in STRIDES:
        n = imgsz // s
        cy, cx = jnp.meshgrid(
            (jnp.arange(n) + 0.5) * s / imgsz, (jnp.arange(n) + 0.5) * s / imgsz,
            indexing="ij",
        )
        centers.append(jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1))
        strides.append(jnp.full((n * n,), s, jnp.float32))
    return jnp.concatenate(centers), jnp.concatenate(strides)


def _ciou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU between matched xyxy boxes [..., 4] -> [...]."""
    eps = 1e-7
    ix1 = jnp.maximum(pred[..., 0], gt[..., 0])
    iy1 = jnp.maximum(pred[..., 1], gt[..., 1])
    ix2 = jnp.minimum(pred[..., 2], gt[..., 2])
    iy2 = jnp.minimum(pred[..., 3], gt[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_p = jnp.clip(pred[..., 2] - pred[..., 0], 0) * jnp.clip(pred[..., 3] - pred[..., 1], 0)
    area_g = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    union = area_p + area_g - inter + eps
    iou = inter / union

    cw = jnp.maximum(pred[..., 2], gt[..., 2]) - jnp.minimum(pred[..., 0], gt[..., 0])
    ch = jnp.maximum(pred[..., 3], gt[..., 3]) - jnp.minimum(pred[..., 1], gt[..., 1])
    c2 = cw**2 + ch**2 + eps
    rho2 = (
        ((pred[..., 0] + pred[..., 2]) - (gt[..., 0] + gt[..., 2])) ** 2
        + ((pred[..., 1] + pred[..., 3]) - (gt[..., 1] + gt[..., 3])) ** 2
    ) / 4.0
    wp = jnp.clip(pred[..., 2] - pred[..., 0], eps)
    hp = jnp.clip(pred[..., 3] - pred[..., 1], eps)
    wg = jnp.clip(gt[..., 2] - gt[..., 0], eps)
    hg = jnp.clip(gt[..., 3] - gt[..., 1], eps)
    v = (4 / jnp.pi**2) * (jnp.arctan(wg / hg) - jnp.arctan(wp / hp)) ** 2
    alpha = v / (1 - iou + v + eps)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def detection_loss(
    level_outputs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    gt_boxes: jnp.ndarray,  # [B, M, 4] normalized xyxy
    gt_mask: jnp.ndarray,  # [B, M] bool
    imgsz: int,
    box_weight: float = 7.5,
    cls_weight: float = 0.5,
    dfl_weight: float = 1.5,
) -> jnp.ndarray:
    b = gt_boxes.shape[0]
    centers, stride = _anchor_centers(imgsz)  # [A,2], [A]
    a = centers.shape[0]

    # flatten predictions over levels
    box_logits = jnp.concatenate(
        [o[0].astype(jnp.float32).reshape(b, -1, 4, REG_MAX) for o in level_outputs], axis=1
    )  # [B, A, 4, R]
    cls_logits = jnp.concatenate(
        [o[1].astype(jnp.float32).reshape(b, -1, o[1].shape[-1]) for o in level_outputs], axis=1
    )  # [B, A, nc]

    # assigner: anchor center inside GT; pick the smallest containing GT
    cx, cy = centers[:, 0], centers[:, 1]
    inside = (
        (cx[None, :, None] > gt_boxes[:, None, :, 0])
        & (cx[None, :, None] < gt_boxes[:, None, :, 2])
        & (cy[None, :, None] > gt_boxes[:, None, :, 1])
        & (cy[None, :, None] < gt_boxes[:, None, :, 3])
        & gt_mask[:, None, :]
    )  # [B, A, M]
    areas = (gt_boxes[..., 2] - gt_boxes[..., 0]) * (gt_boxes[..., 3] - gt_boxes[..., 1])
    cand = jnp.where(inside, areas[:, None, :], jnp.inf)
    assigned = jnp.argmin(cand, axis=-1)  # [B, A]
    positive = inside.any(axis=-1)  # [B, A]
    tgt = jnp.take_along_axis(
        gt_boxes, jnp.broadcast_to(assigned[:, :, None], (b, a, 4)), axis=1
    )

    # --- cls BCE (single class: objectness-style) ---
    cls_tgt = positive.astype(jnp.float32)[..., None]
    bce = optax_sigmoid_bce(cls_logits, jnp.broadcast_to(cls_tgt, cls_logits.shape))
    cls_l = bce.mean()

    # --- box: CIoU on decoded positives ---
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    dist = jax.nn.softmax(box_logits, axis=-1) @ bins  # [B, A, 4] in stride units
    dist_n = dist * stride[None, :, None] / imgsz  # normalized units
    pred = jnp.stack(
        [cx[None] - dist_n[..., 0], cy[None] - dist_n[..., 1],
         cx[None] + dist_n[..., 2], cy[None] + dist_n[..., 3]], axis=-1
    )
    npos = positive.sum() + 1e-6
    box_l = jnp.where(positive, 1.0 - _ciou(pred, tgt), 0.0).sum() / npos

    # --- DFL: CE to the two bins adjacent to the target distance ---
    tgt_ltrb = jnp.stack(
        [cx[None] - tgt[..., 0], cy[None] - tgt[..., 1],
         tgt[..., 2] - cx[None], tgt[..., 3] - cy[None]], axis=-1
    ) * imgsz / stride[None, :, None]
    tgt_ltrb = jnp.clip(tgt_ltrb, 0, REG_MAX - 1 - 1e-3)
    lo = jnp.floor(tgt_ltrb)
    wl = 1.0 - (tgt_ltrb - lo)
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    lo_i = lo.astype(jnp.int32)
    ce_lo = -jnp.take_along_axis(logp, lo_i[..., None], -1)[..., 0]
    ce_hi = -jnp.take_along_axis(logp, (lo_i + 1)[..., None], -1)[..., 0]
    dfl = (ce_lo * wl + ce_hi * (1 - wl)).mean(-1)
    dfl_l = jnp.where(positive, dfl, 0.0).sum() / npos

    return box_weight * box_l + cls_weight * cls_l + dfl_weight * dfl_l


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable BCE-with-logits (optax.sigmoid_binary_cross_entropy)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def caption_loss(logits: jnp.ndarray, labels: jnp.ndarray, pad_id: int = 1) -> jnp.ndarray:
    """Teacher-forced CE over non-pad targets: logits [B,T,V], labels [B,T]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = (labels != pad_id).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
