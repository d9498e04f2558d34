"""Annotation helpers for eval/real_gt.json ground truth.

Hand-annotating grounding targets on the reference screenshots needs
pixel coordinates read off the image.  Two helpers:

  grid <img> <out.png> [--step 100] [--scale 0.5]
      Draw a labeled coordinate grid (original-pixel units) over a
      (possibly downscaled) copy -- coarse localization pass.

  crops <img> <out.png> x1,y1,x2,y2 [more boxes...]
      Contact sheet of candidate gt boxes rendered at full resolution
      with a 10 px fine grid and the box outlined -- verification pass
      (the box must tightly bound the element; scoring is
      centroid-inside-gt, eval/real_bench.py).
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _font(size=16):
    import glob

    files = sorted(glob.glob("/usr/share/fonts/**/*.ttf", recursive=True))
    return ImageFont.truetype(files[0], size) if files else ImageFont.load_default()


def grid(img_path: str, out: str, step: int = 100, scale: float = 0.5):
    im = Image.open(img_path).convert("RGB")
    w, h = im.size
    im2 = im.resize((int(w * scale), int(h * scale)), Image.LANCZOS)
    d = ImageDraw.Draw(im2)
    f = _font(14)
    for x in range(0, w, step):
        xs = x * scale
        d.line([(xs, 0), (xs, im2.size[1])], fill=(255, 0, 0), width=1)
        if x % (2 * step) == 0:
            d.text((xs + 2, 2), str(x), fill=(255, 0, 0), font=f)
            d.text((xs + 2, im2.size[1] - 18), str(x), fill=(255, 0, 0), font=f)
    for y in range(0, h, step):
        ys = y * scale
        d.line([(0, ys), (im2.size[0], ys)], fill=(0, 160, 255), width=1)
        if y % (2 * step) == 0:
            d.text((2, ys + 2), str(y), fill=(0, 160, 255), font=f)
            d.text((im2.size[0] - 48, ys + 2), str(y), fill=(0, 160, 255), font=f)
    im2.save(out)
    print(out, im2.size, "orig", (w, h))


def region(img_path: str, out: str, x1: int, y1: int, x2: int, y2: int,
           step: int = 20, zoom: int = 2):
    """Full-res crop of [x1:x2, y1:y2] at `zoom`, fine grid labeled in
    ORIGINAL image coordinates -- precise bbox reading pass."""
    im = Image.open(img_path).convert("RGB")
    t = im.crop((x1, y1, x2, y2))
    t = t.resize((t.size[0] * zoom, t.size[1] * zoom), Image.LANCZOS)
    d = ImageDraw.Draw(t)
    f = _font(12)
    for x in range(x1 - x1 % step, x2, step):
        xs = (x - x1) * zoom
        major = x % 100 == 0
        d.line([(xs, 0), (xs, t.size[1])],
               fill=(255, 0, 0) if major else (255, 160, 160), width=1)
        if major:
            d.text((xs + 1, 1), str(x), fill=(255, 0, 0), font=f)
    for y in range(y1 - y1 % step, y2, step):
        ys = (y - y1) * zoom
        major = y % 100 == 0
        d.line([(0, ys), (t.size[0], ys)],
               fill=(0, 160, 255) if major else (170, 215, 255), width=1)
        if major:
            d.text((1, ys + 1), str(y), fill=(0, 120, 255), font=f)
    t.save(out)
    print(out, t.size)


def crops(img_path: str, out: str, boxes, pad: int = 30, zoom: int = 2):
    im = Image.open(img_path).convert("RGB")
    tiles = []
    f = _font(14)
    for i, b in enumerate(boxes):
        x1, y1, x2, y2 = b
        cx1, cy1 = max(x1 - pad, 0), max(y1 - pad, 0)
        cx2, cy2 = min(x2 + pad, im.size[0]), min(y2 + pad, im.size[1])
        t = im.crop((cx1, cy1, cx2, cy2))
        t = t.resize((t.size[0] * zoom, t.size[1] * zoom), Image.NEAREST)
        d = ImageDraw.Draw(t)
        d.rectangle([(x1 - cx1) * zoom, (y1 - cy1) * zoom,
                     (x2 - cx1) * zoom, (y2 - cy1) * zoom],
                    outline=(255, 0, 0), width=2)
        d.text((2, 2), f"#{i} {b}", fill=(255, 0, 0), font=f)
        tiles.append(t)
    tw = max(t.size[0] for t in tiles)
    th = sum(t.size[1] + 4 for t in tiles)
    sheet = Image.new("RGB", (tw, th), (255, 255, 255))
    y = 0
    for t in tiles:
        sheet.paste(t, (0, y))
        y += t.size[1] + 4
    sheet.save(out)
    print(out, sheet.size)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("grid")
    g.add_argument("img"), g.add_argument("out")
    g.add_argument("--step", type=int, default=100)
    g.add_argument("--scale", type=float, default=0.5)
    r = sub.add_parser("region")
    r.add_argument("img"), r.add_argument("out")
    r.add_argument("x1", type=int), r.add_argument("y1", type=int)
    r.add_argument("x2", type=int), r.add_argument("y2", type=int)
    r.add_argument("--step", type=int, default=20)
    r.add_argument("--zoom", type=int, default=2)
    c = sub.add_parser("crops")
    c.add_argument("img"), c.add_argument("out")
    c.add_argument("boxes", nargs="+")
    c.add_argument("--zoom", type=int, default=2)
    args = ap.parse_args()
    if args.cmd == "grid":
        grid(args.img, args.out, args.step, args.scale)
    elif args.cmd == "region":
        region(args.img, args.out, args.x1, args.y1, args.x2, args.y2,
               args.step, args.zoom)
    else:
        boxes = [tuple(int(v) for v in b.split(",")) for b in args.boxes]
        crops(args.img, args.out, boxes, zoom=args.zoom)


if __name__ == "__main__":
    main()
