"""End-to-end parse quality on held-out synthetic GUI scenes.

The strongest no-external-weights statement the framework can make: with
BOTH shipped checkpoints (detector: weights/det_synth, OCR:
weights/ocr_en_synth) the full parse — letterbox, detect, NMS, OCR
det/rec, overlap merge, SOM — recovers the scene's ground truth.  The
reference has no equivalent automated gate (SURVEY §4: no tests at all).
"""

import os

import numpy as np
import pytest

DET = os.path.join(os.path.dirname(__file__), "..",
                   "omniparser_tpu", "weights", "det_synth")
OCR = os.path.join(os.path.dirname(__file__), "..",
                   "omniparser_tpu", "weights", "ocr_en_synth")
CAP = os.path.join(os.path.dirname(__file__), "..",
                   "omniparser_tpu", "weights", "cap_synth")


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


@pytest.mark.skipif(not (os.path.isdir(DET) and os.path.isdir(OCR)),
                    reason="shipped checkpoints absent")
def test_full_parse_recovers_synthetic_scene():
    import dataclasses

    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.train.synth_gui import render_gui_scene

    base = PipelineConfig()  # all-auto weights
    # scenes are 640px; run the detector at its native bucket (the demo
    # slider exposes imgsz — gradio_demo.py:68-76 — so this is a user knob)
    cfg = dataclasses.replace(
        base, detector=dataclasses.replace(base.detector, default_imgsz=640),
        ocr=dataclasses.replace(base.ocr, det_imgsz=960))
    p = SOMPipeline(cfg)

    rng = np.random.default_rng(777001)
    icon_recall_n = icon_recall_d = 0
    text_hits = text_total = 0
    cap_hits = cap_total = 0
    for _ in range(2):
        img, gt_icons, gt_text_boxes, gt_texts, gt_kinds = render_gui_scene(
            rng, size=640, return_kinds=True)
        _, _, elements = p.parse_image(img)
        icon_elems = [([c * 640 for c in e["bbox"]], e) for e in elements
                      if e["type"] == "icon"]
        pred_icons = [b for b, _ in icon_elems]
        # icon recall @ IoU 0.5; captioned matches must name the glyph
        # (shipped cap_synth captioner, train/train_captioner.CAPTIONS)
        for g, kind in zip(gt_icons, gt_kinds):
            icon_recall_d += 1
            match = [e for b, e in icon_elems if _iou(g, b) >= 0.5]
            if match:
                icon_recall_n += 1
                e = match[0]
                if os.path.isdir(CAP) and e["source"] == "box_yolo_content_yolo":
                    from omniparser_tpu.train.train_captioner import CAPTIONS

                    cap_total += 1
                    cap_hits += (e["content"] or "") == CAPTIONS[kind]
        # text recovery: each GT line should appear (fuzzily) in some text
        # element; OCR was trained to ~char level on this distribution
        parsed_texts = " | ".join(
            (e["content"] or "") for e in elements if e["type"] == "text").lower()
        for t in gt_texts:
            t = t.strip().lower()
            if len(t) < 4:
                continue
            text_total += 1
            # fuzzy containment: at least half the words appear
            words = [w for w in t.split() if len(w) >= 3]
            if not words:
                text_total -= 1
                continue
            hits = sum(1 for w in words if w in parsed_texts)
            if hits >= max(1, len(words) // 2):
                text_hits += 1

    icon_recall = icon_recall_n / max(icon_recall_d, 1)
    text_recall = text_hits / max(text_total, 1)
    assert icon_recall >= 0.75, (icon_recall, icon_recall_d)
    assert text_recall >= 0.5, (text_recall, text_total)
    if cap_total:
        cap_acc = cap_hits / cap_total
        assert cap_acc >= 0.5, (cap_acc, cap_total)
