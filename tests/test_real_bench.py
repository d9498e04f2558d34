"""Real-pixels grounding benchmark plumbing (eval/real_bench.py).

The scored run needs the TPU (it parses 5 full-resolution reference
screenshots ~60 times); these tests pin the checked-in ground truth's
schema and the dataset normalization so annotation drift fails fast.
Reference analogue: the shipped eval log's record shape
(/root/reference/eval/logs_sspro_omniv2.json).
"""

import json
import os

import pytest

from omniparser_tpu.eval.real_bench import _GT, load_dataset


def test_gt_schema():
    with open(_GT) as f:
        gt = json.load(f)
    assert gt["images"], "empty ground truth"
    n = 0
    for name, targets in gt["images"].items():
        assert name.endswith((".png", ".jpg"))
        for t in targets:
            assert set(t) == {"instruction", "gt_bbox_px", "group"}
            x1, y1, x2, y2 = t["gt_bbox_px"]
            assert x1 < x2 and y1 < y2, (name, t)
            assert t["group"] in ("text", "icon")
            assert t["instruction"].startswith("click")
            n += 1
    icons = sum(1 for ts in gt["images"].values()
                for t in ts if t["group"] == "icon")
    # round-4 goal (VERDICT r3 #1a): >=150 targets incl >=30 icons over
    # the usable reference screenshots; cap guards against runaway
    # auto-generation that would dilute the hand-verified set
    assert 150 <= n <= 500, f"annotation count {n} outside the >=150 goal"
    assert icons >= 30, f"icon count {icons} below the >=30 goal"


def test_dataset_normalizes_to_ratio():
    if not os.path.isdir("/root/reference/imgs"):
        pytest.skip("reference images unavailable")
    rows = load_dataset()
    assert len(rows) >= 30
    for r in rows:
        assert r["group"] in ("text", "icon")
        for v in r["gt_bbox"]:
            assert 0.0 <= v <= 1.0, r["image_name"]
        x1, y1, x2, y2 = r["gt_bbox"]
        assert x1 < x2 and y1 < y2
        assert r["img_path"].ndim == 3  # loaded image, not a path
