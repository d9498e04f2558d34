"""NumPy/pure-Python oracles restating the reference's loop semantics.

These are deliberately written as slow, obvious loops — they are the *spec*
(transcribed from the behavior of util/utils.py:231-309, 178-228 and
torchvision greedy NMS), against which the vectorized JAX ops are tested.
"""

from __future__ import annotations

import numpy as np


def _area(b):
    return (b[2] - b[0]) * (b[3] - b[1])


def _inter(b1, b2):
    w = min(b1[2], b2[2]) - max(b1[0], b2[0])
    h = min(b1[3], b2[3]) - max(b1[1], b2[1])
    return max(0.0, w) * max(0.0, h)


def max_overlap_ratio(b1, b2):
    """Reference IoU-with-containment (util/utils.py:249-257)."""
    inter = _inter(b1, b2)
    union = _area(b1) + _area(b2) - inter + 1e-6
    if _area(b1) > 0 and _area(b2) > 0:
        r1, r2 = inter / _area(b1), inter / _area(b2)
    else:
        r1 = r2 = 0.0
    return max(inter / union, r1, r2)


def is_inside(inner, outer, threshold=0.80):
    """util/utils.py:259-263 (ratio of inner's area covered)."""
    return _inter(inner, outer) / _area(inner) > threshold


def greedy_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics: returns kept indices, score-descending."""
    order = list(np.argsort(-np.asarray(scores), kind="stable"))
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        rest = []
        for j in order:
            inter = _inter(boxes[i], boxes[j])
            union = _area(boxes[i]) + _area(boxes[j]) - inter
            iou = inter / union if union > 0 else 0.0
            if iou <= iou_threshold:
                rest.append(j)
        order = rest
    return keep


def merge_icons_and_ocr_oracle(icon_boxes, ocr_elems, iou_threshold):
    """Faithful restatement of remove_overlap_new (util/utils.py:231-309).

    icon_boxes: list of [x1,y1,x2,y2];
    ocr_elems: list of dicts {'bbox': [...], 'content': str} (order matters).
    Returns (output list of dicts, per-icon content or None for kept icons).
    The output mirrors the reference's: surviving OCR elems in order, then
    appended icon elems in order.
    """
    out = [dict(e, type="text", interactivity=False, source="box_ocr_content_ocr") for e in ocr_elems]
    kept_icons = []
    for i, box1 in enumerate(icon_boxes):
        ok = True
        for j, box2 in enumerate(icon_boxes):
            if i != j and max_overlap_ratio(box1, box2) > iou_threshold and _area(box1) > _area(box2):
                ok = False
                break
        if not ok:
            continue
        dropped = False
        labels = ""
        for elem in ocr_elems:
            if dropped:
                break
            box3 = elem["bbox"]
            if is_inside(box3, box1):
                # text donated even if the elem was already removed
                labels += elem["content"] + " "
                matches = [o for o in out if o.get("bbox") == box3 and o.get("content") == elem["content"]]
                if matches:
                    out.remove(matches[0])
            elif is_inside(box1, box3):
                dropped = True
        if not dropped:
            if labels:
                icon = {"type": "icon", "bbox": box1, "interactivity": True,
                        "content": labels, "source": "box_yolo_content_ocr"}
            else:
                icon = {"type": "icon", "bbox": box1, "interactivity": True,
                        "content": None, "source": "box_yolo_content_yolo"}
            out.append(icon)
            kept_icons.append((i, labels if labels else None))
    return out, kept_icons


def remove_overlap_v1_oracle(boxes, iou_threshold, ocr_bbox=None):
    """Restatement of the legacy remove_overlap (util/utils.py:178-228)."""
    def is_inside95(b1, b2):
        return _inter(b1, b2) / _area(b1) > 0.95

    out = list(ocr_bbox) if ocr_bbox else []
    for i, b1 in enumerate(boxes):
        ok = True
        for j, b2 in enumerate(boxes):
            if i != j and max_overlap_ratio(b1, b2) > iou_threshold and _area(b1) > _area(b2):
                ok = False
                break
        if not ok:
            continue
        if ocr_bbox:
            if any(max_overlap_ratio(b1, b3) > iou_threshold and not is_inside95(b1, b3)
                   for b3 in ocr_bbox):
                continue
        out.append(list(b1))
    return out
