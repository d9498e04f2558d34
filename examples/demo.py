"""Standalone demo (reference parity: gradio_demo.py / demo.ipynb).

Parses screenshots, writes SOM overlays + an element table.  Mirrors the
reference demo's knobs (box threshold slider default 0.05, IoU 0.1, imgsz):

    python examples/demo.py imgs/*.png --out /tmp/som --box_threshold 0.05
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser("omniparser_tpu demo")
    ap.add_argument("images", nargs="+")
    ap.add_argument("--out", default="/tmp/omniparser_tpu_demo")
    ap.add_argument("--box_threshold", type=float, default=0.05)
    ap.add_argument("--iou_threshold", type=float, default=0.1)  # demo default (gradio_demo.py:70)
    ap.add_argument("--ocr_backend", default="jax")
    ap.add_argument("--no_captions", action="store_true")
    args = ap.parse_args()

    import cv2
    import dataclasses

    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.utils.image import load_image_rgb

    base = PipelineConfig()
    cfg = dataclasses.replace(
        base,
        ocr=dataclasses.replace(base.ocr, backend=args.ocr_backend),
        captioner=dataclasses.replace(
            base.captioner, backend="null" if args.no_captions else "florence"
        ),
    )
    pipeline = SOMPipeline(cfg)
    os.makedirs(args.out, exist_ok=True)

    images = [load_image_rgb(p) for p in args.images]
    t0 = time.perf_counter()
    results = pipeline.parse_batch(images)
    wall = time.perf_counter() - t0
    print(f"parsed {len(images)} screenshots in {wall:.2f}s "
          f"({len(images)/wall:.2f} shots/sec)")

    for path, (annotated, coords, elements) in zip(args.images, results):
        stem = os.path.splitext(os.path.basename(path))[0]
        cv2.imwrite(os.path.join(args.out, f"{stem}_som.png"),
                    cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR))
        with open(os.path.join(args.out, f"{stem}_elements.json"), "w") as f:
            json.dump(elements, f, indent=2)
        print(f"\n{path}: {len(elements)} elements")
        for line in pipeline.content_lines(elements)[:10]:
            print("  " + line)
        if len(elements) > 10:
            print(f"  ... ({len(elements) - 10} more)")
    print(f"\noutputs in {args.out}/")


if __name__ == "__main__":
    main()
