#!/usr/bin/env python
"""Caption the hand-annotated REAL icon crops with the shipped captioner.

Isolates the captioner from detection/grounding: each icon target in
eval/real_gt.json is cropped from the full-resolution screenshot with the
inference-path geometry (ops.preprocess.crop_resize_batch, the same
bilinear crop the fused step's crop-gather performs) and run through
FlorenceCaptioner.caption_crops.  The expected phrase is the instruction
minus the "click the " prefix (eval/real_bench.py grounds by exact
phrase match, so caption accuracy here bounds icon grounding there).

CLI:
    python scripts/eval_icon_captions.py [--cpu] [--ckpt PATH]
Prints per-crop predictions and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tunnel-safe)")
    ap.add_argument("--ckpt", default=None,
                    help="captioner checkpoint dir (default: shipped cap_synth)")
    ap.add_argument("--log", default=None, help="write per-crop JSONL here")
    ap.add_argument("--pad", type=float, default=0.0,
                    help="expand each GT box by this fraction per side "
                         "(0.35 approximates the detector's overshoot on "
                         "rails, which crops glyph+label composites)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from omniparser_tpu.config import CaptionerConfig
    from omniparser_tpu.models.florence2 import (FlorenceCaptioner,
                                                 default_captioner_weights)
    from omniparser_tpu.ops.preprocess import crop_resize_batch
    from omniparser_tpu.utils.image import load_image_rgb

    gt_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "omniparser_tpu", "eval", "real_gt.json")
    with open(gt_path) as f:
        gt = json.load(f)

    ckpt = args.ckpt or default_captioner_weights()
    cap = FlorenceCaptioner.from_synth_checkpoint(ckpt, CaptionerConfig())

    crops, expects, names = [], [], []
    for image_name, targets in gt["images"].items():
        path = os.path.join("/root/reference/imgs", image_name)
        if not os.path.exists(path):
            continue
        icon_ts = [t for t in targets if t["group"] == "icon"]
        if not icon_ts:
            continue
        img = load_image_rgb(path)
        h, w = img.shape[:2]
        boxes = np.array(
            [[t["gt_bbox_px"][0] / w, t["gt_bbox_px"][1] / h,
              t["gt_bbox_px"][2] / w, t["gt_bbox_px"][3] / h]
             for t in icon_ts], np.float32)
        if args.pad:
            bw = boxes[:, 2] - boxes[:, 0]
            bh = boxes[:, 3] - boxes[:, 1]
            boxes[:, 0] = np.clip(boxes[:, 0] - args.pad * bw, 0, 1)
            boxes[:, 1] = np.clip(boxes[:, 1] - args.pad * bh, 0, 1)
            boxes[:, 2] = np.clip(boxes[:, 2] + args.pad * bw, 0, 1)
            boxes[:, 3] = np.clip(boxes[:, 3] + args.pad * bh, 0, 1)
        dev = jnp.asarray(img)
        hw = jnp.asarray([h, w], jnp.int32)
        out = np.asarray(crop_resize_batch(
            dev, hw, jnp.asarray(boxes), cap.config.crop_size))
        for t, c in zip(icon_ts, out):
            crops.append(c)
            expects.append(t["instruction"].removeprefix("click the ").strip())
            names.append(image_name)

    preds = []
    bs = 32
    for s in range(0, len(crops), bs):
        batch = np.stack(crops[s:s + bs])
        valid = np.ones(len(batch), bool)
        preds.extend(cap.caption_crops(jnp.asarray(batch), valid))

    correct = 0
    rows = []
    for name, exp, pred in zip(names, expects, preds):
        ok = pred.strip() == exp
        correct += ok
        rows.append({"image": name, "expected": exp,
                     "predicted": pred.strip(), "correct": bool(ok)})
        print(f"{'OK  ' if ok else 'MISS'} {name:24s} {exp:22s} -> {pred.strip()}")
    if args.log:
        with open(args.log, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    print(json.dumps({
        "metric": "real-crop caption exact-match",
        "correct": correct, "n": len(rows),
        "accuracy": round(correct / max(len(rows), 1), 4),
        "ckpt": ckpt,
    }))


if __name__ == "__main__":
    main()
