import json

import numpy as np
import pytest

from omniparser_tpu.agent.llm import MockLLM
from omniparser_tpu.eval.screenspot import (
    ScreenSpotModel,
    extract_bbox_id,
    reformat_messages,
    run_eval,
    score_records,
)


class FakePipeline:
    def parse_image(self, image_rgb):
        elements = [
            {"type": "text", "bbox": [0.1, 0.1, 0.3, 0.15], "interactivity": False,
             "content": "File", "source": "box_ocr_content_ocr"},
            {"type": "icon", "bbox": [0.5, 0.5, 0.7, 0.7], "interactivity": True,
             "content": "save", "source": "box_yolo_content_yolo"},
        ]
        coords = {"0": [0.1, 0.1, 0.2, 0.05], "1": [0.5, 0.5, 0.2, 0.2]}
        return image_rgb, coords, elements


def test_reformat_messages():
    elems = FakePipeline().parse_image(None)[2]
    html = reformat_messages(elems)
    assert '<p id=0 class="text" alt="File">' in html
    assert '<img id=1 class="icon" alt="save">' in html


def test_extract_bbox_id():
    assert extract_bbox_id("reasons...\nClick BBox ID: 7") == 7
    assert extract_bbox_id("```Click BBox ID: `12```") == 12
    assert extract_bbox_id("Click BBox ID: 3 ... Click BBox ID: 5") == 5
    assert extract_bbox_id("no id here") is None


def test_ground_only_positive(rng, tmp_path):
    img = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    path = str(tmp_path / "shot.png")
    import cv2

    cv2.imwrite(path, img)
    llm = MockLLM(["the save icon matches.\nClick BBox ID: 1"])
    model = ScreenSpotModel(FakePipeline(), llm)
    res = model.ground_only_positive("save the file", path)
    assert res["point"] == pytest.approx([0.6, 0.6])
    assert res["bbox"] == pytest.approx([0.5, 0.5, 0.7, 0.7])
    # prompt carried the pseudo-HTML and two images
    content = llm.calls[0]["messages"][0]["content"]
    assert sum(1 for b in content if b["type"] == "image") == 2


def test_ground_invalid_id(rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    llm = MockLLM(["Click BBox ID: 99"])
    model = ScreenSpotModel(FakePipeline(), llm)
    res = model.ground_only_positive("x", img)
    assert res["point"] is None


def test_score_records():
    records = [
        {"pred": [0.5, 0.5], "gt_bbox": [0.4, 0.4, 0.6, 0.6], "group": "Dev"},
        {"pred": [0.1, 0.1], "gt_bbox": [0.4, 0.4, 0.6, 0.6], "group": "Dev"},
        {"pred": None, "gt_bbox": [0, 0, 1, 1], "group": "OS"},
    ]
    s = score_records(records)
    assert s["Dev"] == 0.5 and s["OS"] == 0.0
    assert s["overall"] == pytest.approx(1 / 3)
    assert s["n"] == 3


def test_run_eval_log(rng, tmp_path):
    import cv2

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "a.png")
    cv2.imwrite(path, img)
    llm = MockLLM(["Click BBox ID: 1", "Click BBox ID: 0"])
    model = ScreenSpotModel(FakePipeline(), llm)
    data = [
        {"img_path": path, "instruction": "save", "gt_bbox": [0.5, 0.5, 0.7, 0.7], "group": "Dev"},
        {"img_path": path, "instruction": "open", "gt_bbox": [0.5, 0.5, 0.7, 0.7], "group": "Dev"},
    ]
    log = str(tmp_path / "log.jsonl")
    scores = run_eval(model, data, log_path=log)
    assert scores["overall"] == 0.5
    lines = [json.loads(l) for l in open(log)]
    assert lines[0]["correctness"] == "correct" and lines[1]["correctness"] == "wrong"
