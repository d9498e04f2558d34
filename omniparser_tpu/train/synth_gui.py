"""Synthetic GUI scenes with icon ground truth (detector training data).

The reference's icon detector is a YOLOv8 fine-tuned on GUI screenshots
(README.md:39 icon_detect weights); those weights cannot be fetched in
this environment, so the TPU-native detector trains here on procedurally
rendered screens: colored panels + window chrome + text lines (negatives)
+ icon-like glyphs (positives, single class 'interactable icon').

Glyph families cover the shapes that dominate real GUI chrome: buttons,
gears, hamburgers, magnifiers, arrows, stars, crosses, dots-grids,
folders, toggles, and image-thumbnail noise patches.

Reuses the text machinery from train/synth_text.py so text looks like the
OCR stage's training distribution (no detector/OCR domain mismatch).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from omniparser_tpu.train.synth_text import _FONT_FILES, _font, sample_text

ICON_KINDS = (
    "button", "gear", "hamburger", "magnifier", "arrow", "star", "cross",
    "plus", "dots", "folder", "toggle", "ring", "thumbnail", "chevron",
)


def _rand_color(rng, base=None, min_contrast=70):
    c = rng.integers(0, 256, 3)
    if base is not None:
        while abs(int(c.mean()) - int(np.mean(base))) < min_contrast:
            c = rng.integers(0, 256, 3)
    return tuple(int(x) for x in c)


def _draw_icon(draw, rng, x, y, s, fg, bg, kind: str | None = None) -> str:
    """One glyph inside the s x s box at (x, y).  Returns the kind drawn
    (captioner training labels — train/train_captioner.py)."""
    if kind is None:
        kind = ICON_KINDS[int(rng.integers(0, len(ICON_KINDS)))]
    x2, y2 = x + s, y + s
    m = max(s // 6, 1)  # inner margin
    w = max(s // 10, 1)  # stroke width
    if kind == "button":
        r = max(s // 5, 2)
        draw.rounded_rectangle([x, y, x2, y2], radius=r,
                               fill=fg if rng.random() < 0.5 else None,
                               outline=fg, width=w)
        if rng.random() < 0.6:  # inner dot/bar
            cx, cy = x + s // 2, y + s // 2
            q = max(s // 5, 1)
            draw.ellipse([cx - q, cy - q, cx + q, cy + q], fill=bg)
    elif kind == "gear":
        cx, cy = x + s / 2, y + s / 2
        pts = []
        for i in range(16):
            ang = i * np.pi / 8
            rad = s / 2 - 1 if i % 2 == 0 else s / 3
            pts.append((cx + rad * np.cos(ang), cy + rad * np.sin(ang)))
        draw.polygon(pts, fill=fg)
        q = max(s // 6, 1)
        draw.ellipse([cx - q, cy - q, cx + q, cy + q], fill=bg)
    elif kind == "hamburger":
        for i in range(3):
            yy = y + m + i * (s - 2 * m) // 2
            draw.rectangle([x + m, yy, x2 - m, min(yy + w, y2)], fill=fg)
    elif kind == "magnifier":
        d = int(s * 0.6)
        draw.ellipse([x + m, y + m, x + m + d, y + m + d], outline=fg, width=w)
        draw.line([x + m + d, y + m + d, x2 - 1, y2 - 1], fill=fg, width=w)
    elif kind == "arrow":
        if rng.random() < 0.5:
            pts = [(x + m, y + s / 2), (x2 - m, y + m), (x2 - m, y2 - m)]
        else:
            pts = [(x2 - m, y + s / 2), (x + m, y + m), (x + m, y2 - m)]
        draw.polygon(pts, fill=fg)
    elif kind == "star":
        cx, cy = x + s / 2, y + s / 2
        pts = []
        for i in range(10):
            ang = -np.pi / 2 + i * np.pi / 5
            rad = s / 2 - 1 if i % 2 == 0 else s / 5
            pts.append((cx + rad * np.cos(ang), cy + rad * np.sin(ang)))
        draw.polygon(pts, fill=fg)
    elif kind == "cross":
        draw.line([x + m, y + m, x2 - m, y2 - m], fill=fg, width=w)
        draw.line([x + m, y2 - m, x2 - m, y + m], fill=fg, width=w)
    elif kind == "plus":
        cx, cy = x + s // 2, y + s // 2
        draw.rectangle([x + m, cy - w // 2, x2 - m, cy + w - w // 2], fill=fg)
        draw.rectangle([cx - w // 2, y + m, cx + w - w // 2, y2 - m], fill=fg)
    elif kind == "dots":
        n = 3
        for i in range(n):
            for j in range(n):
                cx = x + m + i * (s - 2 * m) // (n - 1)
                cy = y + m + j * (s - 2 * m) // (n - 1)
                q = max(s // 10, 1)
                draw.ellipse([cx - q, cy - q, cx + q, cy + q], fill=fg)
    elif kind == "folder":
        draw.rectangle([x, y + s // 4, x2, y2], fill=fg)
        draw.rectangle([x, y + s // 8, x + s // 2, y + s // 4], fill=fg)
    elif kind == "toggle":
        draw.rounded_rectangle([x, y + s // 4, x2, y2 - s // 4],
                               radius=s // 4, fill=fg)
        side = x2 - s // 2 if rng.random() < 0.5 else x
        draw.ellipse([side, y + s // 8, side + s // 2, y2 - s // 8], fill=bg,
                     outline=fg, width=1)
    elif kind == "ring":
        draw.ellipse([x + 1, y + 1, x2 - 1, y2 - 1], outline=fg, width=w)
    elif kind == "chevron":
        cx = x + s // 2
        draw.line([x + m, y + m, cx, y + s // 2], fill=fg, width=w)
        draw.line([cx, y + s // 2, x + m, y2 - m], fill=fg, width=w)
        draw.line([cx, y + m, x2 - m, y + s // 2], fill=fg, width=w)
        draw.line([x2 - m, y + s // 2, cx, y2 - m], fill=fg, width=w)
    else:  # thumbnail: structured noise patch
        noise = np.random.default_rng(int(rng.integers(1 << 31))).integers(
            0, 255, (max(s // 4, 2), max(s // 4, 2), 3), dtype=np.uint8)
        from PIL import Image

        tile = Image.fromarray(noise).resize((s, s))
        draw._image.paste(tile, (x, y))
    return kind


def render_icon_tile(
    rng: np.random.Generator, tile: int = 96, kind: str | None = None,
) -> Tuple[np.ndarray, str, List[int]]:
    """One icon glyph on a GUI-ish background tile (captioner training).

    Returns (RGB uint8 [tile,tile,3], kind, glyph box xyxy px).  The
    glyph gets the same size/color statistics as render_gui_scene icons;
    the surrounding tile leaves room for detector-box jitter when the
    caller crops.
    """
    from PIL import Image, ImageDraw

    base = tuple(int(x) for x in rng.integers(0, 256, 3))
    img = Image.new("RGB", (tile, tile), base)
    draw = ImageDraw.Draw(img)
    # panel edge / separator clutter like real scenes
    if rng.random() < 0.4:
        shade = tuple(int(np.clip(c + rng.integers(-60, 60), 0, 255))
                      for c in base)
        if rng.random() < 0.5:
            y = int(rng.integers(0, tile))
            draw.rectangle([0, y, tile, tile], fill=shade)
        else:
            x = int(rng.integers(0, tile))
            draw.rectangle([x, 0, tile, tile], fill=shade)
    arr_probe = np.asarray(img)
    s = int(rng.integers(14, min(57, tile - 4)))
    x = int(rng.integers(2, tile - s - 1))
    y = int(rng.integers(2, tile - s - 1))
    local = tuple(int(c) for c in
                  arr_probe[y:y + s, x:x + s].reshape(-1, 3).mean(0))
    fg = _rand_color(rng, local)
    kind = _draw_icon(draw, rng, x, y, s, fg, local, kind=kind)
    arr = np.asarray(img, np.float32)
    if rng.random() < 0.4:
        arr = arr + rng.normal(0.0, rng.uniform(1.0, 5.0), arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8), kind, [x, y, x + s, y + s]


def render_gui_scene(
    rng: np.random.Generator, size: int = 640, max_icons: int = 48,
    max_texts: int = 20, return_kinds: bool = False,
) -> Tuple[np.ndarray, List[List[int]], List[List[int]], List[str]]:
    """A colored GUI-like screen.

    Returns (RGB uint8 [size,size,3], icon boxes xyxy px, text boxes, texts)
    — plus the per-icon glyph kinds when return_kinds (captioner e2e gate).
    Icon boxes are the detector GT; text lines are negatives (the reference
    detector boxes icons, OCR owns text).
    """
    from PIL import Image, ImageDraw

    base = tuple(int(x) for x in rng.integers(0, 256, 3))
    canvas = Image.new("RGB", (size, size), base)
    draw = ImageDraw.Draw(canvas)

    # panels / chrome
    for _ in range(int(rng.integers(2, 9))):
        x1, y1 = int(rng.integers(0, size - 20)), int(rng.integers(0, size - 20))
        x2 = int(rng.integers(x1 + 16, min(x1 + size, size)))
        y2 = int(rng.integers(y1 + 16, min(y1 + size, size)))
        shade = tuple(int(np.clip(c + rng.integers(-60, 60), 0, 255)) for c in base)
        if rng.random() < 0.6:
            draw.rectangle([x1, y1, x2, y2], fill=shade)
        else:
            draw.rectangle([x1, y1, x2, y2], outline=shade,
                           width=int(rng.integers(1, 4)))
    for _ in range(int(rng.integers(0, 4))):  # separators
        y = int(rng.integers(0, size))
        draw.line([(0, y), (size, y)],
                  fill=tuple(int(np.clip(c + rng.integers(-50, 50), 0, 255))
                             for c in base), width=1)

    occupied = np.zeros((size, size), bool)
    arr_probe = np.asarray(canvas)

    def free(x, y, w, h, g=4):
        ys, ye = max(y - g, 0), min(y + h + g, size)
        xs, xe = max(x - g, 0), min(x + w + g, size)
        return not occupied[ys:ye, xs:xe].any()

    def claim(x, y, w, h, g=4):
        occupied[max(y - g, 0):min(y + h + g, size),
                 max(x - g, 0):min(x + w + g, size)] = True

    # text lines (detector negatives)
    texts: List[str] = []
    text_boxes: List[List[int]] = []
    for _ in range(int(rng.integers(max_texts // 2, max_texts + 1))):
        text = sample_text(rng)
        sizept = int(rng.integers(10, 26))
        font = _font(_FONT_FILES[int(rng.integers(0, len(_FONT_FILES)))], sizept)
        probe = ImageDraw.Draw(Image.new("L", (8, 8)))
        bx0, by0, bx1, by1 = probe.textbbox((0, 0), text, font=font)
        tw, th = bx1 - bx0, by1 - by0
        if tw < 2 or th < 2 or tw >= size - 4 or th >= size - 4:
            continue
        x = int(rng.integers(1, size - tw - 1))
        y = int(rng.integers(1, size - th - 1))
        if not free(x, y, tw, th):
            continue
        local = arr_probe[y:y + th, x:x + tw].mean()
        fg = ((0, 0, 0) if local > 128 else (255, 255, 255)) \
            if rng.random() < 0.7 else _rand_color(rng, base)
        draw.text((x - bx0, y - by0), text, fill=fg, font=font)
        claim(x, y, tw, th)
        texts.append(text)
        text_boxes.append([x, y, x + tw, y + th])

    # icons (detector positives)
    icon_boxes: List[List[int]] = []
    kinds: List[str] = []
    for _ in range(int(rng.integers(max_icons // 2, max_icons + 1))):
        s = int(rng.integers(14, 56))
        x = int(rng.integers(1, size - s - 1))
        y = int(rng.integers(1, size - s - 1))
        if not free(x, y, s, s):
            continue
        local = tuple(int(c) for c in
                      arr_probe[y:y + s, x:x + s].reshape(-1, 3).mean(0))
        fg = _rand_color(rng, local)
        kinds.append(_draw_icon(draw, rng, x, y, s, fg, local))
        claim(x, y, s, s)
        icon_boxes.append([x, y, x + s, y + s])

    arr = np.asarray(canvas, np.float32)
    if rng.random() < 0.4:
        arr = arr + rng.normal(0.0, rng.uniform(1.0, 5.0), arr.shape)
    out = np.clip(arr, 0, 255).astype(np.uint8)
    if return_kinds:
        return out, icon_boxes, text_boxes, texts, kinds
    return out, icon_boxes, text_boxes, texts
