"""Vectorized geometry / suppression / preprocessing ops (pure JAX, CPU-testable)."""

from omniparser_tpu.ops.boxes import (
    box_area,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_xyxy_to_xywh,
    box_xywh_to_xyxy,
    pairwise_intersection,
    pairwise_iou,
    pairwise_max_overlap_ratio,
    int_box_area,
)
from omniparser_tpu.ops.nms import nms_fixed_shape
from omniparser_tpu.ops.overlap import merge_icons_and_ocr, OverlapResult

__all__ = [
    "box_area",
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_xyxy_to_xywh",
    "box_xywh_to_xyxy",
    "pairwise_intersection",
    "pairwise_iou",
    "pairwise_max_overlap_ratio",
    "int_box_area",
    "nms_fixed_shape",
    "merge_icons_and_ocr",
    "OverlapResult",
]
