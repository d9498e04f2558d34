"""Golden-output regression tests (SURVEY.md §4: golden tests against the
reference images).  Without real weights the goldens pin the *random-init,
seed-0* detection path on CPU: any change to preprocessing, the detector
graph, NMS, suppression or box remapping that shifts a box by more than
IoU 0.99 fails here.  Regenerate deliberately via tests/goldens/ (see
command in this file) when a change is intended.

Regenerate:
    python -c "exec(open('tests/test_golden.py').read()); regenerate()"
"""

import json
import os

import numpy as np
import pytest

from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
from omniparser_tpu.pipeline import SOMPipeline
from omniparser_tpu.utils.image import load_image_rgb

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
IMAGES = {"demo_image.jpg": "demo_image_det640_seed0.json",
          "mobile.png": "mobile_det640_seed0.json"}


def _config():
    return PipelineConfig(
        detector=DetectorConfig(default_imgsz=640, max_detections=64, box_threshold=0.05),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
        # pin random init: these goldens are a seed-0 graph regression
        # tripwire, independent of the shipped trained checkpoint
        detector_weights=None,
    )


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


@pytest.fixture(scope="module")
def pipeline():
    return SOMPipeline(_config())


@pytest.mark.parametrize("image_name", sorted(IMAGES))
def test_golden_detection(pipeline, image_name):
    path = f"/root/reference/imgs/{image_name}"
    if not os.path.exists(path):
        pytest.skip("reference image unavailable")
    golden = json.load(open(os.path.join(GOLDEN_DIR, IMAGES[image_name])))
    # random-init at conf 0.05 scores ~every anchor ~0.5: the prefilter
    # overflow warning is EXPECTED here (meaningless model, not a silent
    # cap — the trained checkpoint runs warning-free, see BENCH logs);
    # assert it fires so the no-silent-caps contract stays pinned
    with pytest.warns(RuntimeWarning, match="prefilter overflow"):
        _, _, elements = pipeline.parse_image(load_image_rgb(path))
    assert len(elements) == len(golden), (
        f"element count changed: {len(elements)} vs golden {len(golden)}"
    )
    for got, want in zip(elements, golden):
        assert got["type"] == want["type"]
        assert got["source"] == want["source"]
        iou = _iou(got["bbox"], want["bbox"])
        assert iou >= 0.99, f"box drift: IoU {iou:.4f} vs {want['bbox']}"


def regenerate():  # pragma: no cover — manual tool
    p = SOMPipeline(_config())
    for name, fname in IMAGES.items():
        img = load_image_rgb(f"/root/reference/imgs/{name}")
        _, _, elements = p.parse_image(img)
        out = [{"bbox": [round(float(v), 6) for v in e["bbox"]],
                "type": e["type"], "source": e["source"]} for e in elements]
        json.dump(out, open(os.path.join(GOLDEN_DIR, fname), "w"), indent=1)
        print(name, len(out))
