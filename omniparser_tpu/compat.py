"""Reference-shaped function API for drop-in migration.

Users of the reference import `get_som_labeled_img`, `check_ocr_box`,
`get_yolo_model`, `get_caption_model_processor` from util.utils
(util/utils.py:407, 504, 71, 47).  This module exposes the same names over
the TPU pipeline so existing call sites port with an import swap.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
from omniparser_tpu.ocr import check_ocr_box  # noqa: F401  (same signature)

_PIPELINE_CACHE: Dict = {}
_PIPELINE_CACHE_MAX = 4  # FIFO-evicted; each entry pins compiled graphs+params
import threading as _threading

_compat_lock = _threading.Lock()


def get_xywh(input) -> Tuple[int, int, int, int]:
    """Quad (4 corner points) -> int xywh (util/utils.py:489-492)."""
    x, y = input[0][0], input[0][1]
    w, h = input[2][0] - input[0][0], input[2][1] - input[0][1]
    return int(x), int(y), int(w), int(h)


def get_xyxy(input) -> Tuple[int, int, int, int]:
    """Quad -> int xyxy (util/utils.py:494-497)."""
    return int(input[0][0]), int(input[0][1]), int(input[2][0]), int(input[2][1])


def get_xywh_yolo(input) -> Tuple[int, int, int, int]:
    """xyxy list -> int xywh (util/utils.py:499-502)."""
    return (int(input[0]), int(input[1]),
            int(input[2] - input[0]), int(input[3] - input[1]))


def predict_yolo(model: Tuple, image, box_threshold: float, imgsz=None,
                 scale_img: bool = False, iou_threshold: float = 0.7):
    """Reference signature (util/utils.py:378-399): returns (boxes xyxy in
    pixels, confidences, phrases) for one image.

    imgsz is honored whenever given (snapped to a static letterbox bucket,
    compiled once per bucket) — a superset of the reference, where
    util/utils.py:382 only forwards imgsz when scale_img=True but the demo
    slider (gradio_demo.py:68-76) passes imgsz expecting it to matter.
    scale_img itself needs no separate action: we always letterbox."""
    import dataclasses

    import jax.numpy as jnp

    from omniparser_tpu.models.yolov8 import snap_imgsz
    from omniparser_tpu.ops.preprocess import pad_to_bucket, pick_bucket_2d

    detector, params = model
    if imgsz is not None:
        detector = dataclasses.replace(detector, imgsz=snap_imgsz(imgsz))
    img = image
    if hasattr(img, "convert"):
        img = np.asarray(img.convert("RGB"))
    img = np.asarray(img)
    h, w = img.shape[:2]
    hb, wb = pick_bucket_2d(h, w)
    padded, _ = pad_to_bucket(img, hb, wb)
    boxes_norm, scores, valid = detector.detect(
        params, jnp.asarray(padded), jnp.asarray([h, w], jnp.int32),
        box_threshold, iou_threshold,
    )
    boxes_norm, scores, valid = map(np.asarray, (boxes_norm, scores, valid))
    boxes_px = boxes_norm[valid] * np.array([w, h, w, h], np.float32)
    conf = scores[valid]
    phrases = [str(i) for i in range(len(boxes_px))]
    return boxes_px, conf, phrases


def remove_overlap(boxes, iou_threshold: float, ocr_bbox: Optional[List] = None):
    """Legacy v1 filter (util/utils.py:178-228), vectorized: drop a box if a
    *smaller* box overlaps it above threshold; with ocr_bbox, also drop boxes
    overlapping (but not >95% inside) any OCR box.  Returns kept boxes."""
    import jax.numpy as jnp

    from omniparser_tpu.ops.boxes import (
        box_area,
        containment_ratio,
        pairwise_max_overlap_ratio,
    )

    b = jnp.asarray(np.asarray(boxes, np.float32).reshape(-1, 4))
    n = b.shape[0]
    if n == 0:
        return np.zeros((0, 4), np.float32)
    ratio = pairwise_max_overlap_ratio(b, b)
    area = box_area(b)
    not_self = ~jnp.eye(n, dtype=bool)
    suppressed = (not_self & (ratio > iou_threshold) & (area[:, None] > area[None, :])).any(1)
    keep = ~suppressed
    if ocr_bbox:
        o = jnp.asarray(np.asarray(ocr_bbox, np.float32).reshape(-1, 4))
        overlap = pairwise_max_overlap_ratio(b, o) > iou_threshold
        inside = containment_ratio(b, o) > 0.95  # is_inside (v1 uses 0.95)
        keep = keep & ~(overlap & ~inside).any(axis=1)
    kept = np.asarray(b)[np.asarray(keep)]
    if ocr_bbox:
        kept = np.concatenate([np.asarray(ocr_bbox, np.float32).reshape(-1, 4), kept])
    return kept


def get_parsed_content_icon(filtered_boxes, starting_idx, image_source,
                            caption_model_processor, prompt=None,
                            batch_size: int = 128) -> List[str]:
    """Reference signature (util/utils.py:78-122): caption the non-OCR
    boxes of an image.  filtered_boxes: [N,4] normalized xyxy (array-like);
    starting_idx: first content-less index (boxes before it are skipped);
    caption_model_processor: a captioner from get_caption_model_processor."""
    import jax.numpy as jnp

    from omniparser_tpu.ops.preprocess import crop_resize_batch, pad_to_bucket, pick_bucket_2d

    img = image_source
    if hasattr(img, "convert"):
        img = np.asarray(img.convert("RGB"))
    img = np.asarray(img)
    h, w = img.shape[:2]
    boxes = np.asarray(filtered_boxes, np.float32).reshape(-1, 4)
    if starting_idx:
        boxes = boxes[starting_idx:]
    if len(boxes) == 0:
        return []

    hb, wb = pick_bucket_2d(h, w)
    padded, _ = pad_to_bucket(img, hb, wb)
    padded_dev = jnp.asarray(padded)
    hw = jnp.asarray([h, w], jnp.int32)
    crop_size = getattr(caption_model_processor, "config", CaptionerConfig()).crop_size

    out: List[str] = []
    pad_n = -(-len(boxes) // batch_size) * batch_size
    arr = np.zeros((pad_n, 4), np.float32)
    arr[: len(boxes)] = boxes
    valid = np.zeros(pad_n, bool)
    valid[: len(boxes)] = True
    for s in range(0, pad_n, batch_size):
        crops = crop_resize_batch(padded_dev, hw, jnp.asarray(arr[s : s + batch_size]),
                                  crop_size)
        out.extend(caption_model_processor.caption_crops(crops, valid[s : s + batch_size]))
    return out


def load_image(image_path: str):
    """DINO-style legacy loader (util/utils.py:312-323): returns
    (image np RGB uint8, normalized CHW float32 array) with the shorter
    side resized to 800 px capped at 1333, ImageNet-normalized.

    The main parse path never calls this (it letterboxes on device,
    ops/preprocess.py); kept for migration parity."""
    from PIL import Image

    src = Image.open(image_path).convert("RGB")
    image = np.asarray(src)
    w, h = src.size
    scale = min(800.0 / min(h, w), 1333.0 / max(h, w))
    tw, th = round(w * scale), round(h * scale)
    resized = np.asarray(src.resize((tw, th), Image.BILINEAR), np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    transformed = ((resized - mean) / std).transpose(2, 0, 1)
    return image, transformed


def predict(model, image, caption: str, box_threshold: float,
            text_threshold: float):
    """Grounded (open-vocabulary) detection with the reference's signature
    (util/utils.py:357-375): returns (boxes xyxy px, logits, phrases).

    The reference delegates to an HF GroundingDINO-class model; that model
    family is not part of this framework, so the TPU build composes its own
    parts: detect boxes (YOLOv8 + on-device NMS), caption each crop
    (Florence-class), and ground captions against the '.'-separated query
    phrases by token overlap.  `model` mirrors the reference dict shape:
    {'model': (detector, params), 'processor': captioner}.
    """
    detector_pair = model["model"] if isinstance(model, dict) else model
    captioner = model.get("processor") if isinstance(model, dict) else None

    img = image
    if hasattr(img, "convert"):
        img = np.asarray(img.convert("RGB"))
    img = np.asarray(img)
    boxes, conf, _ = predict_yolo(detector_pair, img, box_threshold)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    conf = np.asarray(conf, np.float32).reshape(-1)
    queries = [p.strip().lower() for p in caption.split(".") if p.strip()]
    if not len(boxes) or not queries:
        return boxes[:0], conf[:0], []

    if captioner is not None:
        h, w = img.shape[:2]
        boxes_norm = boxes / np.array([w, h, w, h], np.float32)
        texts = get_parsed_content_icon(boxes_norm, 0, img, captioner)
    else:  # no captioner: ground on nothing, keep detector ordering
        texts = [""] * len(boxes)

    def overlap(text: str, query: str) -> float:
        t = set(text.lower().split())
        q = set(query.split())
        return len(t & q) / len(q) if q else 0.0

    keep_boxes, logits, phrases = [], [], []
    for i, text in enumerate(texts):
        scores = [overlap(text, q) for q in queries]
        j = int(np.argmax(scores))
        if scores[j] >= text_threshold:
            keep_boxes.append(boxes[i])
            logits.append(conf[i] * scores[j])
            phrases.append(queries[j])
    return (np.array(keep_boxes, np.float32).reshape(-1, 4),
            np.array(logits, np.float32), phrases)


def get_yolo_model(model_path: Optional[str] = None, variant: str = "n"):
    """Reference: ultralytics YOLO(model_path), except any
    `icon_detect_v3` path routes to the YOLOv9-E TorchScript wrapper —
    OmniParser v2.0's default detector (util/utils.py:72-81,
    util/yolov9.py:27-50).  Same routing here: icon_detect_v3 paths (or
    an explicit 'v9*' variant) build the GELAN-family detector.
    Returns (Detector, params) — pass as `model=` to get_som_labeled_img.

    DELIBERATE default divergence: the reference with model_path=None
    defaults to the YOLOv9-E wrapper (util/utils.py:78); here the no-path
    no-variant default is YOLOv8-n, because the shipped trained
    `det_synth` weights are v8-n and a random-init v9e would be slower
    AND meaningless.  Pass variant='v9e' for reference-default behavior."""
    import pathlib

    import jax

    if (variant.startswith("v9")
            or (model_path and "icon_detect_v3" in pathlib.Path(model_path).parts)):
        from omniparser_tpu.models.yolov9 import YOLOv9Detector
        from omniparser_tpu.weights.convert_yolov9 import load_yolov9_params

        det = YOLOv9Detector(
            variant=(variant[2:] or "e") if variant.startswith("v9") else "e",
            num_classes=1,
        )
        if model_path:
            params = load_yolov9_params(model_path, det)
        else:
            params = det.init_params(jax.random.PRNGKey(0))
        return det, params

    from omniparser_tpu.models.yolov8 import Detector

    det = Detector(variant=variant, num_classes=1)
    if model_path:
        from omniparser_tpu.weights.convert_yolo import load_detector_params

        params = load_detector_params(model_path, det)
    else:
        params = det.init_params(jax.random.PRNGKey(0))
    return det, params


def get_caption_model_processor(model_name: str = "florence2",
                                model_name_or_path: Optional[str] = None,
                                device=None):
    """Reference: HF Florence-2/BLIP-2 loader (util/utils.py:47-68).
    Returns a captioner object (the 'model'+'processor' pair fused)."""
    if model_name == "blip2":
        from omniparser_tpu.models.blip2 import Blip2Captioner
        from omniparser_tpu.weights.convert_blip2 import load_blip2_params

        cfg = CaptionerConfig(backend="blip2", max_new_tokens=100)
        if model_name_or_path:
            params, dims, tok = load_blip2_params(model_name_or_path)
            from omniparser_tpu.models.tokenizer import load_tokenizer

            return Blip2Captioner(cfg, dims=dims, params=params,
                                  tokenizer=load_tokenizer(tok))
        return Blip2Captioner(cfg)
    if "phi3" in model_name:  # 'phi3_v' selection, util/utils.py:449-450
        from omniparser_tpu.models.phi3v import Phi3VCaptioner

        cfg = CaptionerConfig(model_name="phi3_v", backend="phi3v",
                              max_new_tokens=25)
        return Phi3VCaptioner(cfg)
    if model_name != "florence2":
        raise NotImplementedError(
            f"caption model {model_name!r} not implemented "
            "(florence2, blip2, phi3_v)"
        )
    from omniparser_tpu.models.florence2 import FlorenceCaptioner

    cfg = CaptionerConfig()
    if model_name_or_path:
        return FlorenceCaptioner.from_checkpoint(model_name_or_path, cfg)
    return FlorenceCaptioner(cfg)


def get_parsed_content_icon_phi3v(filtered_boxes, ocr_bbox, image_source,
                                  caption_model_processor) -> List[str]:
    """Reference signature (util/utils.py:126-176): caption the non-OCR
    boxes with a Phi-3-V-class model.  filtered_boxes: [N,4] normalized
    xyxy; the first len(ocr_bbox) boxes are OCR and skipped; batches of 5,
    greedy max_new_tokens=25 — all preserved in Phi3VCaptioner."""
    n_skip = len(ocr_bbox) if ocr_bbox else 0
    return get_parsed_content_icon(filtered_boxes, n_skip, image_source,
                                   caption_model_processor,
                                   batch_size=getattr(
                                       caption_model_processor, "batch_size", 5))


def get_som_labeled_img(
    image_source,
    model: Optional[Tuple] = None,
    BOX_TRESHOLD: float = 0.01,
    output_coord_in_ratio: bool = False,
    ocr_bbox: Optional[List] = None,
    text_scale: float = 0.4,
    text_padding: int = 5,
    draw_bbox_config: Optional[Dict] = None,
    caption_model_processor=None,
    ocr_text: List[str] = [],
    use_local_semantics: bool = True,
    iou_threshold: float = 0.9,
    prompt=None,
    scale_img: bool = False,
    imgsz=None,
    batch_size: int = 128,
):
    """Reference signature (util/utils.py:407) over the TPU pipeline.

    Returns (encoded_som_image, label_coordinates, parsed_content_list),
    exactly like the reference.  ocr_bbox: pixel xyxy; ocr_text: parallel
    strings (the check_ocr_box output).
    """
    import dataclasses

    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.utils.image import encode_image_base64, load_image_rgb

    if isinstance(image_source, str):
        image_rgb = load_image_rgb(image_source)
    else:
        img = image_source
        if hasattr(img, "convert"):
            img = np.asarray(img.convert("RGB"))
        image_rgb = np.asarray(img)

    # thresholds stay OUT of the config/cache key: parse_image takes them as
    # traced per-call values, so sweeping them reuses one compiled graph.
    # imgsz IS in the key (it changes the compiled letterbox bucket —
    # reference demo slider, gradio_demo.py:68-76).
    from omniparser_tpu.models.yolov8 import snap_imgsz

    base = PipelineConfig()
    use_cap = bool(use_local_semantics and caption_model_processor)
    det_cfg = base.detector
    if imgsz is not None:
        det_cfg = dataclasses.replace(det_cfg, default_imgsz=snap_imgsz(imgsz))
    cfg = dataclasses.replace(
        base,
        detector=det_cfg,
        use_local_semantics=use_local_semantics,
        output_coord_in_ratio=output_coord_in_ratio,
        captioner=dataclasses.replace(
            base.captioner, batch_size=batch_size,
            backend="florence" if use_cap else "null",
        ),
        ocr=dataclasses.replace(base.ocr, backend="null"),  # ocr passed in
    )

    detector = detector_params = None
    if model is not None:
        detector, detector_params = model
        if imgsz is not None:
            detector = dataclasses.replace(detector, imgsz=snap_imgsz(imgsz))

    class _ProvidedOCR:
        def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
            return list(ocr_text), [list(b) for b in (ocr_bbox or [])]

    som_style = dict(draw_bbox_config) if draw_bbox_config else {
        # reference annotate() fixed defaults (util/utils.py:326-331):
        # thickness=3, text_thickness=2 — NOT the ratio-scaled server style
        "text_scale": text_scale, "text_padding": text_padding,
        "text_thickness": 2, "thickness": 3,
    }

    # jit caches live on the pipeline instance: reuse one per
    # (config, models).  The lock serializes the per-call mutable state
    # (ocr closure, params) — concurrent callers get consistent parses.
    # key by the CALLER's objects (cfg carries imgsz): the dataclasses.replace
    # above makes a fresh Detector per call, which must not defeat the cache
    key = (cfg, id(model[0]) if model is not None else None,
           id(caption_model_processor))
    with _compat_lock:
        pipeline = _PIPELINE_CACHE.get(key)
        if pipeline is None:
            pipeline = SOMPipeline(
                cfg, detector=detector, detector_params=detector_params,
                # use_local_semantics=False: icons must keep content None
                # (util/utils.py:463-465) — never wire a captioner in
                captioner=caption_model_processor if use_cap else None,
                ocr=_ProvidedOCR(),
            )
            if len(_PIPELINE_CACHE) >= _PIPELINE_CACHE_MAX:
                _PIPELINE_CACHE.pop(next(iter(_PIPELINE_CACHE)))
            _PIPELINE_CACHE[key] = pipeline
        else:
            pipeline.ocr = _ProvidedOCR()
            if detector_params is not None:
                pipeline.detector_params = detector_params
        annotated, label_coordinates, elements = pipeline.parse_image(
            image_rgb, box_threshold=BOX_TRESHOLD, iou_threshold=iou_threshold,
            som_style=som_style,
        )
    return encode_image_base64(annotated), label_coordinates, elements
