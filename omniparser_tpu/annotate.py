"""Set-of-Mark (SOM) overlay renderer.

Host-side drawing reproducing the reference's annotator behavior
(util/box_annotator.py:10-262 + util/utils.py:326-354): per-box palette
color, numeric labels, luminance-chosen text color, and the four-candidate
overlap-avoiding label placement (top-left -> outer-left -> outer-right ->
top-right, rejecting candidates with IoU > 0.3 against any detection or
out-of-image).

Drawing is cv2 (C++); this is deliberately host work — the reference keeps
it on host too, and it's bandwidth-trivial next to the device pipeline.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

# Distinct default palette (role equivalent to supervision's
# ColorPalette.DEFAULT — values are our own; pass `palette=` for custom).
DEFAULT_PALETTE: Tuple[str, ...] = (
    "#e6194b", "#3cb44b", "#ffe119", "#4363d8", "#f58231",
    "#911eb4", "#46f0f0", "#f032e6", "#bcf60c", "#fabebe",
    "#008080", "#e6beff", "#9a6324", "#fffac8", "#800000",
    "#aaffc3", "#808000", "#ffd8b1", "#000075", "#808080",
)

_LABEL_IOU_REJECT = 0.3  # util/box_annotator.py:199


def _hex_to_rgb(h: str) -> Tuple[int, int, int]:
    h = h.lstrip("#")
    return tuple(int(h[i : i + 2], 16) for i in (0, 2, 4))


def _iou_max_ratio(a, b) -> float:
    """max(iou, inter/area_a, inter/area_b) — util/box_annotator.py:175-186."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    iw = max(0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b - inter
    iou = inter / union if union > 0 else 0.0
    if area_a > 0 and area_b > 0:
        return max(iou, inter / area_a, inter / area_b)
    return iou


def _candidate_positions(pad: int, tw: int, th: int, x1: int, y1: int, x2: int):
    """The reference's four label candidates, in priority order
    (util/box_annotator.py:207-262). Yields (text_x, text_y, bg box xyxy)."""
    yield (x1 + pad, y1 - pad, (x1, y1 - 2 * pad - th, x1 + 2 * pad + tw, y1))  # top left
    yield (x1 - pad - tw, y1 + pad + th, (x1 - 2 * pad - tw, y1, x1, y1 + 2 * pad + th))  # outer left
    yield (x2 + pad, y1 + pad + th, (x2, y1, x2 + 2 * pad + tw, y1 + 2 * pad + th))  # outer right
    yield (x2 - pad - tw, y1 - pad, (x2 - 2 * pad - tw, y1 - 2 * pad - th, x2, y1))  # top right


def _iou_max_ratio_any(bg, boxes: np.ndarray, thr: float) -> bool:
    """True if max(iou, inter/area_bg, inter/area_box) > thr for ANY box —
    the vectorized twin of _iou_max_ratio (util/box_annotator.py:175-186).
    boxes: [N,4] float array."""
    if len(boxes) == 0:
        return False
    bx1, by1, bx2, by2 = bg
    iw = np.minimum(bx2, boxes[:, 2]) - np.maximum(bx1, boxes[:, 0])
    ih = np.minimum(by2, boxes[:, 3]) - np.maximum(by1, boxes[:, 1])
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    area_bg = (bx2 - bx1) * (by2 - by1)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area_bg + areas - inter
    iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
    both = (area_bg > 0) & (areas > 0)
    score = np.where(
        both,
        np.maximum(iou, np.maximum(inter / max(area_bg, 1e-12),
                                   inter / np.where(areas > 0, areas, 1.0))),
        iou,
    )
    return bool((score > thr).any())


def place_label(
    pad: int, tw: int, th: int, box, all_boxes, image_wh: Tuple[int, int]
):
    """Pick the first candidate that avoids detections and stays in-image;
    fall back to the last candidate (util/box_annotator.py:189-262).

    all_boxes may be a [N,4] np array (fast path — the pure-Python pairwise
    loop was the annotate hot spot at ~100 boxes) or any iterable of xyxy."""
    x1, y1, x2, _ = box
    W, H = image_wh
    boxes_np = np.asarray(all_boxes, np.float64).reshape(-1, 4)
    last = None
    for tx, ty, bg in _candidate_positions(pad, tw, th, x1, y1, x2):
        last = (tx, ty, bg)
        bx1, by1, bx2, by2 = bg
        if bx1 < 0 or by1 < 0 or bx2 > W or by2 > H:
            continue
        if _iou_max_ratio_any(bg, boxes_np, _LABEL_IOU_REJECT):
            continue
        return tx, ty, bg
    return last


def annotate_som(
    image_rgb: np.ndarray,
    boxes_xyxy_px: np.ndarray,
    labels: Optional[Sequence[str]] = None,
    text_scale: float = 0.4,
    text_thickness: int = 2,
    text_padding: int = 5,
    thickness: int = 3,
    palette: Sequence[str] = DEFAULT_PALETTE,
) -> np.ndarray:
    """Draw numbered boxes with overlap-avoiding labels; returns a copy.

    boxes_xyxy_px: [N, 4] pixel xyxy.  labels default to "0".."N-1"
    (the reference labels by index: util/utils.py:347).
    """
    scene = image_rgb.copy()
    H, W = scene.shape[:2]
    font = cv2.FONT_HERSHEY_SIMPLEX
    boxes = boxes_xyxy_px.astype(int)
    det_list = [tuple(b) for b in boxes]
    if labels is None:
        labels = [str(i) for i in range(len(boxes))]

    for i, (x1, y1, x2, y2) in enumerate(det_list):
        color = _hex_to_rgb(palette[i % len(palette)])
        cv2.rectangle(scene, (x1, y1), (x2, y2), color, thickness)
        text = labels[i]
        (tw, th), _ = cv2.getTextSize(text, font, text_scale, text_thickness)
        tx, ty, bg = place_label(text_padding, tw, th, (x1, y1, x2, y2), det_list, (W, H))
        cv2.rectangle(scene, (bg[0], bg[1]), (bg[2], bg[3]), color, cv2.FILLED)
        # text color by background luminance (util/box_annotator.py:148-150)
        lum = 0.299 * color[0] + 0.587 * color[1] + 0.114 * color[2]
        text_color = (0, 0, 0) if lum > 160 else (255, 255, 255)
        cv2.putText(scene, text, (tx, ty), font, text_scale, text_color, text_thickness, cv2.LINE_AA)
    return scene


def annotate(
    image_rgb: np.ndarray,
    boxes_cxcywh_norm: np.ndarray,
    *,
    text_scale: float = 0.4,
    text_thickness: int = 2,
    text_padding: int = 5,
    thickness: int = 3,
) -> Tuple[np.ndarray, Dict[str, List[float]]]:
    """The reference's annotate() wrapper (util/utils.py:326-354):
    normalized cxcywh -> pixel xyxy/xywh; returns (annotated image,
    label_coordinates {index_str: [x, y, w, h] pixels})."""
    h, w = image_rgb.shape[:2]
    scale = np.array([w, h, w, h], np.float32)
    b = boxes_cxcywh_norm.astype(np.float32) * scale
    xyxy = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                     b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1)
    xywh = np.stack([xyxy[:, 0], xyxy[:, 1], b[:, 2], b[:, 3]], axis=1)
    scene = annotate_som(
        image_rgb, xyxy,
        text_scale=text_scale, text_thickness=text_thickness,
        text_padding=text_padding, thickness=thickness,
    )
    label_coordinates = {str(i): [float(v) for v in xywh[i]] for i in range(len(xywh))}
    return scene, label_coordinates
