"""Pipeline-level fuzz oracle: the FULL fused parse (SOMPipeline) against a
pure-Python restatement of the reference's get_som_labeled_img
(util/utils.py:407-486), composed from the per-op oracles.

Per-op fuzzing (test_overlap/test_nms) proves each vectorized op; this
proves their COMPOSITION inside the one-dispatch graph — element content,
ordering, sources, and the int_box_area zero-area gates — by injecting
controlled detections (a preset 'detector') and controlled OCR (fake host
backend) and comparing element lists across ~200 random scenes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
from omniparser_tpu.pipeline import SOMPipeline
from tests.oracles import merge_icons_and_ocr_oracle

H, W = 64, 80  # constant scene shape => one compiled fused graph
N_ICONS = 12
IOU_THR = 0.7


class PresetDetector:
    """detect_graph-compatible stub: 'params' ARE the detections.  Lets the
    fuzz drive the fused graph with exact, adversarial box sets (real
    detector output is random-init noise that cannot hit edge cases like
    exact containment on purpose)."""

    def detect_graph(self, variables, padded, hw, conf, nms_iou,
                     allow_pallas=True, with_stats=False):
        b, s, v = variables["boxes"], variables["scores"], variables["valid"]
        if with_stats:
            return b, s, v, jnp.int32(0)
        return b, s, v


class FakeHostOCR:
    def __init__(self):
        self.texts = []
        self.boxes_px = []

    def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
        return list(self.texts), [list(b) for b in self.boxes_px]


@pytest.fixture(scope="module")
def pipeline():
    cfg = PipelineConfig(
        detector=DetectorConfig(max_detections=N_ICONS),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
    )
    ocr = FakeHostOCR()
    p = SOMPipeline(cfg, detector=PresetDetector(), detector_params={}, ocr=ocr)
    return p, ocr


def _int_area(box, w, h):
    return (int(box[2] * w) - int(box[0] * w)) * (int(box[3] * h) - int(box[1] * h))


def _oracle(icon_boxes, icon_valid, ocr_texts, ocr_boxes_px, w, h):
    """get_som_labeled_img restated (util/utils.py:407-486): zero-area
    gates -> remove_overlap_new -> captionless-last ordering -> null
    captions ('icon')."""
    ocr_elems = []
    for text, bpx in zip(ocr_texts, ocr_boxes_px):
        box = [bpx[0] / w, bpx[1] / h, bpx[2] / w, bpx[3] / h]
        if _int_area(box, w, h) > 0:  # util/utils.py:434-435 filters by area
            ocr_elems.append({"bbox": box, "content": text})
    icons = [
        list(b) for b, v in zip(icon_boxes, icon_valid)
        if v and _int_area(b, w, h) > 0
    ]
    out, _kept = merge_icons_and_ocr_oracle(icons, ocr_elems, IOU_THR)
    # captionless sorted last (util/utils.py:439-441); stable within groups
    withc = [e for e in out if e["content"] is not None]
    noc = [e for e in out if e["content"] is None]
    result = withc + noc
    for e in result:
        if e["content"] is None:  # NullCaptioner labels plain icons 'icon'
            e["content"] = "icon"
    return result


def test_pipeline_matches_oracle_fuzz(pipeline, rng):
    p, ocr = pipeline
    img = np.zeros((H, W, 3), np.uint8)
    for scene in range(200):
        n_icon = int(rng.integers(0, N_ICONS + 1))
        n_ocr = int(rng.integers(0, 12))

        # adversarial geometry: cluster boxes so containment/overlap happen
        def rand_box():
            x1 = float(rng.uniform(0, 0.8))
            y1 = float(rng.uniform(0, 0.8))
            bw = float(rng.uniform(0.02, 0.5))
            bh = float(rng.uniform(0.02, 0.5))
            return [x1, y1, min(x1 + bw, 1.0), min(y1 + bh, 1.0)]

        boxes = np.zeros((N_ICONS, 4), np.float32)
        valid = np.zeros(N_ICONS, bool)
        for i in range(n_icon):
            if i and rng.random() < 0.35:  # derive from an earlier box
                base = boxes[rng.integers(0, i)]
                if rng.random() < 0.5:  # contained
                    boxes[i] = [base[0] + 0.01, base[1] + 0.01,
                                max(base[2] - 0.01, base[0] + 0.02),
                                max(base[3] - 0.01, base[1] + 0.02)]
                else:  # shifted overlap
                    boxes[i] = np.clip(base + rng.uniform(-0.05, 0.05, 4), 0, 1)
            else:
                boxes[i] = rand_box()
            valid[i] = True
        if n_icon and rng.random() < 0.2:  # degenerate zero-area candidate
            k = rng.integers(0, n_icon)
            boxes[k, 2] = boxes[k, 0] + 1e-4
            boxes[k, 3] = boxes[k, 1] + 1e-4
        scores = rng.uniform(0.2, 1.0, N_ICONS).astype(np.float32)

        ocr.texts = [f"t{scene}_{j}" for j in range(n_ocr)]
        ocr.boxes_px = []
        for j in range(n_ocr):
            if n_icon and rng.random() < 0.5:  # inside / around an icon
                base = boxes[rng.integers(0, n_icon)]
                bx = [base[0] + 0.005, base[1] + 0.005,
                      max(base[2] - 0.005, base[0] + 0.01),
                      max(base[3] - 0.005, base[1] + 0.01)]
            else:
                bx = rand_box()
            ocr.boxes_px.append([int(bx[0] * W), int(bx[1] * H),
                                 max(int(bx[2] * W), int(bx[0] * W) + 1),
                                 max(int(bx[3] * H), int(bx[1] * H) + 1)])

        p.detector_params = {
            "boxes": jnp.asarray(boxes),
            "scores": jnp.asarray(scores),
            "valid": jnp.asarray(valid),
        }
        _, _, elements = p.parse_image(img, iou_threshold=IOU_THR)

        want = _oracle(boxes, valid, ocr.texts, ocr.boxes_px, W, H)
        assert len(elements) == len(want), (
            f"scene {scene}: {len(elements)} vs oracle {len(want)}"
        )
        for got, exp in zip(elements, want):
            assert got["source"] == exp["source"], f"scene {scene}"
            assert got["content"] == exp["content"], f"scene {scene}"
            np.testing.assert_allclose(got["bbox"], exp["bbox"], atol=1e-6,
                                       err_msg=f"scene {scene}")
