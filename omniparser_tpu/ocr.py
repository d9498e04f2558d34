"""Pluggable OCR stage (reference: util/utils.py:504-540 `check_ocr_box`).

Backends implement `recognize(image_rgb, padded_dev, orig_hw) ->
(texts: List[str], boxes_xyxy_px: List[[x1,y1,x2,y2]])` with
confidence filtering already applied.

  'jax'      — our DBNet-style detector + CTC recognizer on TPU
               (omniparser_tpu.models.ocr_det / ocr_rec)
  'easyocr'  — host EasyOCR if installed (parity path; gated import)
  'paddle'   — host PaddleOCR if installed (gated import)
  'null'     — no text (detection-only parse)

A `check_ocr_box` function mirrors the reference signature for drop-in use.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from omniparser_tpu.config import OcrConfig


class NullOCR:
    """No text; the parse degrades to detection-only (the reference crashes
    on this path — util/utils.py:428-434 zips None — we make it total)."""

    def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
        return [], []


class EasyOCRBackend:
    """Host EasyOCR (the reference server's engine, util/utils.py:20-22)."""

    def __init__(self, config: OcrConfig):
        import easyocr  # gated: not installed in this image

        self.reader = easyocr.Reader(["en"])
        self.config = config

    def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
        results = self.reader.readtext(
            np.asarray(image_rgb), text_threshold=self.config.text_threshold
        )
        texts, boxes = [], []
        for quad, text, _conf in results:
            xs = [p[0] for p in quad]
            ys = [p[1] for p in quad]
            boxes.append([int(min(xs)), int(min(ys)), int(max(xs)), int(max(ys))])
            texts.append(text)
        return texts, boxes


class PaddleOCRBackend:
    """Host PaddleOCR with the reference's confidence filter
    (util/utils.py:517-519: keep score > text_threshold)."""

    def __init__(self, config: OcrConfig):
        from paddleocr import PaddleOCR  # gated

        self.ocr = PaddleOCR(lang="en", use_angle_cls=False, show_log=False)
        self.config = config

    def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
        result = self.ocr.ocr(np.asarray(image_rgb), cls=False)[0] or []
        texts, boxes = [], []
        for quad, (text, score) in result:
            if score <= self.config.text_threshold:
                continue
            xs = [p[0] for p in quad]
            ys = [p[1] for p in quad]
            boxes.append([int(min(xs)), int(min(ys)), int(max(xs)), int(max(ys))])
            texts.append(text)
        return texts, boxes


def make_ocr_backend(config: OcrConfig, weights: str | None = None):
    if config.backend == "null":
        return NullOCR()
    if config.backend == "jax":
        from omniparser_tpu.models.ocr import JaxOCR, default_ocr_weights

        if weights == "auto":
            weights = default_ocr_weights(config)
        return JaxOCR(config, weights=weights)
    if config.backend == "easyocr":
        return EasyOCRBackend(config)
    if config.backend == "paddle":
        return PaddleOCRBackend(config)
    raise ValueError(f"unknown OCR backend {config.backend!r}")


_BACKEND_CACHE: dict = {}


def _default_backend(cfg: OcrConfig):
    """Singleton default backends keyed by config, with the shipped trained
    checkpoint (weights='auto').  Mirrors the reference's module-level
    `reader`/`paddle_ocr` singletons (util/utils.py:20-31) — building a
    JaxOCR per call would recompile its nets every time."""
    backend = _BACKEND_CACHE.get(cfg)  # OcrConfig is frozen -> hashable
    if backend is None:
        try:
            backend = make_ocr_backend(cfg, weights="auto")
        except ImportError:  # easyocr/paddle not installed -> jax backend
            backend = make_ocr_backend(
                OcrConfig(backend="jax", text_threshold=cfg.text_threshold),
                weights="auto")
        _BACKEND_CACHE[cfg] = backend
    return backend


def check_ocr_box(
    image_source,
    display_img: bool = False,
    output_bb_format: str = "xywh",
    goal_filtering=None,
    easyocr_args: dict | None = None,
    use_paddleocr: bool = False,
    backend=None,
):
    """Reference-compatible entry (util/utils.py:504-540): returns
    ((texts, boxes), goal_filtering) with boxes in xywh or xyxy."""
    from omniparser_tpu.utils.image import load_image_rgb

    if isinstance(image_source, str):
        image_rgb = load_image_rgb(image_source)
    else:
        img = image_source
        if hasattr(img, "convert"):
            img = np.asarray(img.convert("RGB"))
        image_rgb = np.asarray(img)

    args = dict(easyocr_args or {})
    if backend is None:
        cfg = OcrConfig(
            backend="paddle" if use_paddleocr else "jax",
            text_threshold=args.get("text_threshold", 0.5 if use_paddleocr else 0.8),
        )
        backend = _default_backend(cfg)

    # easyocr_args beyond text_threshold (the reference eval passes
    # paragraph/decoder/beamWidth/batch_size — eval/ss_pro_gpt4o_omniv2.py:41):
    # honored by the jax backend; batch_size is a no-op (single device batch).
    kwargs = {}
    if hasattr(backend, "det_params"):  # JaxOCR
        kwargs = dict(
            decoder=args.get("decoder", "greedy"),
            beam_width=args.get("beamWidth", 10),
            paragraph=args.get("paragraph", False),
        )
    texts, boxes_xyxy = backend.recognize(image_rgb, **kwargs)
    if output_bb_format == "xywh":
        bb = [[x1, y1, x2 - x1, y2 - y1] for x1, y1, x2, y2 in boxes_xyxy]
    else:
        bb = [list(b) for b in boxes_xyxy]
    return (texts, bb), goal_filtering
