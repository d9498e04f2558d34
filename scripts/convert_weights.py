"""Convert reference checkpoints to omniparser_tpu orbax trees.

    python scripts/convert_weights.py yolo icon_detect/model.pt out/detector
    python scripts/convert_weights.py florence icon_caption/ out/captioner
    python scripts/convert_weights.py blip2 blip2-opt-2.7b/ out/blip2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser("weight converter")
    ap.add_argument("family", choices=["yolo", "florence", "blip2"])
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--variant", default="n", help="yolo variant")
    args = ap.parse_args()

    from omniparser_tpu.weights.checkpoints import save_checkpoint

    if args.family == "yolo":
        from omniparser_tpu.models.yolov8 import Detector
        from omniparser_tpu.weights.convert_yolo import load_detector_params

        det = Detector(variant=args.variant, num_classes=1)
        tree = load_detector_params(args.src, det)
    elif args.family == "florence":
        from omniparser_tpu.weights.convert_florence import load_florence_params

        tree, _, _ = load_florence_params(args.src)
    else:
        from omniparser_tpu.weights.convert_blip2 import load_blip2_params

        tree, _, _ = load_blip2_params(args.src)

    path = save_checkpoint(args.out, tree)
    print(f"saved {args.family} checkpoint -> {path}")


if __name__ == "__main__":
    main()
