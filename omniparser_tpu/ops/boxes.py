"""Box geometry as vectorized JAX ops.

The reference computes all of this with per-pair Python scalar math inside
O(n^2) loops (util/utils.py:239-263, util/box_annotator.py:165-186).  Here
every quantity is a batched array op so the whole suppression/merge pass
compiles into one fused XLA graph on fixed shapes.

Conventions: boxes are float arrays [..., 4]; xyxy unless suffixed.
All functions are shape-polymorphic over leading dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# The reference's IoU adds 1e-6 to the union (util/utils.py:251) — keep it
# so thresholds bite identically near the boundary.
_UNION_EPS = 1e-6


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; negative-extent boxes get their signed product,
    matching the reference's unclamped ``(x2-x1)*(y2-y1)`` (util/utils.py:240)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def box_xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def box_cxcywh_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=-1)


def pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas between all pairs: a [N,4], b [M,4] -> [N,M].

    Matches util/utils.py:242-247: per-axis overlaps are clamped to 0
    *independently*, so disjoint-in-both-axes pairs contribute 0 (not a
    positive product of negatives).
    """
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])  # [N,M,2]
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Plain IoU matrix [N,M] with the reference's +1e-6 union epsilon."""
    inter = pairwise_intersection(a, b)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter + _UNION_EPS
    return inter / union


def pairwise_max_overlap_ratio(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """The reference's asymmetric "IoU": max(iou, inter/area_a, inter/area_b).

    (util/utils.py:249-257 — the containment ratios only apply when *both*
    areas are > 0, else they're 0.)  Returns [N,M].
    """
    inter = pairwise_intersection(a, b)
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    iou = inter / (area_a + area_b - inter + _UNION_EPS)
    both_pos = (area_a > 0) & (area_b > 0)
    ratio_a = jnp.where(both_pos, inter / jnp.where(area_a == 0, 1.0, area_a), 0.0)
    ratio_b = jnp.where(both_pos, inter / jnp.where(area_b == 0, 1.0, area_b), 0.0)
    return jnp.maximum(iou, jnp.maximum(ratio_a, ratio_b))


def containment_ratio(inner: jnp.ndarray, outer: jnp.ndarray) -> jnp.ndarray:
    """inter(inner_i, outer_j) / area(inner_i) -> [N,M].

    The reference's ``is_inside(box1, box2)`` is this ratio thresholded at
    0.80 (util/utils.py:259-263).  Zero-area inner boxes get ratio 0 (the
    reference would divide by zero; upstream int_box_area filtering makes
    that unreachable — we make it total instead).
    """
    inter = pairwise_intersection(inner, outer)
    area = box_area(inner)[:, None]
    return jnp.where(area > 0, inter / jnp.where(area == 0, 1.0, area), 0.0)


def int_box_area(boxes: jnp.ndarray, w, h) -> jnp.ndarray:
    """Pixel area after int-truncating normalized coords (util/utils.py:401-405).

    boxes: [...,4] normalized xyxy; returns int32 area with the same
    truncation semantics as Python's int() (toward zero).
    """
    scale = jnp.asarray([w, h, w, h], dtype=jnp.float32)
    int_box = jnp.trunc(boxes.astype(jnp.float32) * scale).astype(jnp.int32)
    return (int_box[..., 2] - int_box[..., 0]) * (int_box[..., 3] - int_box[..., 1])
