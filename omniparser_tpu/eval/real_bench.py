"""Real-pixels grounding benchmark over the reference's own screenshots.

The synthetic grounding bench (eval/synth_bench.py) scores the pipeline
on procedurally rendered scenes; this module scores the SAME eval loop
(parse -> pseudo-HTML screen_info -> scripted grounder -> `Click BBox
ID` -> centroid-in-gt scoring, mirroring
/root/reference/eval/ss_pro_gpt4o_omniv2.py:84-218) on the REAL
screenshots shipped in /root/reference/imgs, against a hand-annotated
ground-truth set checked in at eval/real_gt.json.

This is the closest in-image analogue of the reference's ScreenSpot-Pro
log (eval/logs_sspro_omniv2.json, 1,581 records @ 39.53%): the SS-Pro
dataset and a paid LLM are unavailable here, so targets are annotated on
the reference images and the LLM is the deterministic ScriptedGrounder —
the score isolates detection + OCR + caption + coordinate fidelity on
real pixels.

CLI:  python -m omniparser_tpu.eval.real_bench [--log out.jsonl]
prints one JSON line: accuracy overall and by group (text / icon).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

from omniparser_tpu.eval.screenspot import ScreenSpotModel, run_eval
from omniparser_tpu.eval.synth_bench import ScriptedGrounder

_GT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "real_gt.json")
_IMGS = "/root/reference/imgs"


def load_dataset(gt_path: str = _GT, imgs_dir: str = _IMGS) -> List[Dict]:
    """real_gt.json rows -> eval rows.  gt boxes are annotated in pixels
    on the full-resolution image; run_eval scores ratio coords, so they
    are normalized here against each image's true size."""
    from omniparser_tpu.utils.image import load_image_rgb

    with open(gt_path) as f:
        gt = json.load(f)
    rows: List[Dict] = []
    for image_name, targets in gt["images"].items():
        path = os.path.join(imgs_dir, image_name)
        if not os.path.exists(path):
            continue
        img = load_image_rgb(path)
        h, w = img.shape[:2]
        for t in targets:
            x1, y1, x2, y2 = t["gt_bbox_px"]
            rows.append({
                "img_path": img,
                "instruction": t["instruction"],
                "gt_bbox": [x1 / w, y1 / h, x2 / w, y2 / h],
                "group": t["group"],
                "image_name": image_name,
                "size_px": float(min(x2 - x1, y2 - y1)),
            })
    return rows


def run(pipeline=None, log_path=None, gt_path: str = _GT) -> Dict:
    if pipeline is None:
        from omniparser_tpu.config import PipelineConfig
        from omniparser_tpu.pipeline import SOMPipeline

        pipeline = SOMPipeline(PipelineConfig())
    model = ScreenSpotModel(pipeline, ScriptedGrounder())
    dataset = load_dataset(gt_path)
    return run_eval(model, dataset, log_path=log_path)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log", default=None)
    args = ap.parse_args(argv)
    print(json.dumps(run(log_path=args.log)))


if __name__ == "__main__":
    main()
