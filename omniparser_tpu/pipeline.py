"""The screenshot -> structured-elements pipeline.

TPU-native rebuild of the reference hot path (util/omniparser.py:16-32 +
util/utils.py:407-486 `get_som_labeled_img`):

    decode -> [device] letterbox+detect+NMS -> OCR -> [device] overlap/merge
           -> [device] crop-gather + caption decode -> SOM overlay -> JSON

Element schema and ordering match the reference exactly:
  {'type': 'text'|'icon', 'bbox': [x1,y1,x2,y2] normalized, 'interactivity',
   'content', 'source': 'box_ocr_content_ocr'|'box_yolo_content_ocr'|
   'box_yolo_content_yolo'}
with content-less icons sorted last and captioned in order
(util/utils.py:439-462).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.annotate import annotate
from omniparser_tpu.config import PipelineConfig
from omniparser_tpu.models.yolov8 import Detector
from omniparser_tpu.ops.boxes import int_box_area
from omniparser_tpu.ops.overlap import merge_icons_and_ocr
from omniparser_tpu.ops.preprocess import crop_resize_batch, pad_to_bucket, pick_bucket_2d
from omniparser_tpu.utils.image import decode_base64_image, encode_image_base64


class NullCaptioner:
    """Placeholder captioner: labels every icon 'icon'.  Stands in for the
    Florence-2 captioner when no weights are configured (the element schema,
    batching and ordering are identical)."""

    def caption_crops(self, crops_u8: jnp.ndarray, valid: np.ndarray) -> List[str]:
        return ["icon" for _ in range(int(valid.sum()))]


class Element(dict):
    """dict subclass so callers can use both elem['bbox'] and elem.bbox."""

    __getattr__ = dict.__getitem__


def _make_element(typ, bbox, interactivity, content, source) -> Dict:
    return {
        "type": typ,
        "bbox": [float(v) for v in bbox],
        "interactivity": interactivity,
        "content": content,
        "source": source,
    }


class SOMPipeline:
    """End-to-end parse with pluggable detector / captioner / OCR.

    All device stages run on fixed shapes; the only host work is codec,
    OCR text decode (backend-dependent), string assembly and drawing.
    """

    def __init__(
        self,
        config: PipelineConfig,
        detector: Optional[Detector] = None,
        detector_params=None,
        captioner=None,
        ocr=None,
        rng: Optional[jax.Array] = None,
    ):
        self.config = config
        self.detector = detector or Detector(
            variant=config.detector.variant,
            num_classes=config.detector.num_classes,
            imgsz=config.detector.default_imgsz,
            max_det=config.detector.max_detections,
        )
        if detector_params is None:
            if config.detector_weights:
                from omniparser_tpu.weights.convert_yolo import load_detector_params

                detector_params = load_detector_params(config.detector_weights, self.detector)
            else:
                detector_params = self.detector.init_params(rng or jax.random.PRNGKey(0))
        self.detector_params = detector_params

        if captioner is None:
            if not config.use_local_semantics or config.captioner.backend == "null":
                captioner = NullCaptioner()
            else:
                from omniparser_tpu.models.florence2 import FlorenceCaptioner

                if config.captioner_weights:
                    captioner = FlorenceCaptioner.from_checkpoint(
                        config.captioner_weights, config.captioner
                    )
                else:
                    captioner = FlorenceCaptioner(config.captioner)
        self.captioner = captioner

        if ocr is None:
            from omniparser_tpu.ocr import make_ocr_backend

            ocr = make_ocr_backend(config.ocr)
        self.ocr = ocr

        self.last_timings: Dict[str, float] = {}

    # ------------------------------------------------------------------ #

    def parse_image(
        self,
        image_rgb: np.ndarray,
        box_threshold: Optional[float] = None,
        iou_threshold: Optional[float] = None,
    ) -> Tuple[np.ndarray, Dict[str, List[float]], List[Dict]]:
        """np RGB uint8 -> (annotated RGB, label_coordinates, element list)."""
        cfg = self.config
        box_threshold = cfg.detector.box_threshold if box_threshold is None else box_threshold
        iou_threshold = cfg.iou_threshold if iou_threshold is None else iou_threshold
        t = {}
        t0 = time.perf_counter()

        h, w = image_rgb.shape[:2]
        hb, wb = pick_bucket_2d(h, w)
        padded, _ = pad_to_bucket(image_rgb, hb, wb)
        padded_dev = jnp.asarray(padded)  # single host->device upload
        orig_hw = jnp.asarray([h, w], jnp.int32)
        t["upload"] = time.perf_counter() - t0

        # --- OCR (pluggable; may run on device or host) ---
        t0 = time.perf_counter()
        ocr_texts, ocr_boxes_px = self.ocr.recognize(image_rgb, padded_dev, orig_hw)
        t["ocr"] = time.perf_counter() - t0

        # --- detect (jitted: letterbox + backbone + decode + NMS) ---
        t0 = time.perf_counter()
        det_boxes, det_scores, det_valid = self.detector.detect(
            self.detector_params, padded_dev, orig_hw, box_threshold,
            cfg.detector.nms_iou_threshold,
        )
        t["detect"] = time.perf_counter() - t0

        # --- merge (jitted fixed-shape masks) ---
        t0 = time.perf_counter()
        max_ocr = cfg.ocr.max_text_boxes
        ocr_arr = np.zeros((max_ocr, 4), np.float32)
        ocr_valid = np.zeros(max_ocr, bool)
        n_ocr = min(len(ocr_boxes_px), max_ocr)
        if n_ocr:
            scale = np.array([w, h, w, h], np.float32)
            ocr_arr[:n_ocr] = np.asarray(ocr_boxes_px[:n_ocr], np.float32) / scale
            ocr_valid[:n_ocr] = True

        # drop zero-int-area boxes (util/utils.py:434-435)
        det_valid = det_valid & (int_box_area(det_boxes, w, h) > 0)
        ocr_valid_j = jnp.asarray(ocr_valid) & (int_box_area(jnp.asarray(ocr_arr), w, h) > 0)

        res = merge_icons_and_ocr(
            det_boxes, det_valid, jnp.asarray(ocr_arr), ocr_valid_j, iou_threshold
        )
        icon_keep = np.asarray(res.icon_keep)
        ocr_keep = np.asarray(res.ocr_keep)
        absorb = np.asarray(res.absorb)
        det_boxes_np = np.asarray(det_boxes)
        t["merge"] = time.perf_counter() - t0

        # --- assemble elements in reference order: OCR text, icons with
        # absorbed text, then content-less icons (util/utils.py:439-441) ---
        elements: List[Dict] = []
        for k in range(n_ocr):
            if ocr_keep[k]:
                elements.append(
                    _make_element("text", ocr_arr[k], False, ocr_texts[k], "box_ocr_content_ocr")
                )
        icon_labeled, icon_plain = [], []
        for i in np.nonzero(icon_keep)[0]:
            donors = np.nonzero(absorb[i, :n_ocr])[0]
            if len(donors):
                content = "".join(ocr_texts[k] + " " for k in donors)
                icon_labeled.append(
                    _make_element("icon", det_boxes_np[i], True, content, "box_yolo_content_ocr")
                )
            else:
                icon_plain.append(
                    _make_element("icon", det_boxes_np[i], True, None, "box_yolo_content_yolo")
                )
        elements.extend(icon_labeled)
        starting_idx = len(elements) + len(icon_plain) if not icon_plain else len(elements)
        elements.extend(icon_plain)

        # --- caption content-less icons (device crop-gather + decode) ---
        t0 = time.perf_counter()
        if cfg.use_local_semantics and icon_plain:
            crop_boxes = np.stack([e["bbox"] for e in icon_plain]).astype(np.float32)
            bs = cfg.captioner.batch_size
            pad_n = -(-len(crop_boxes) // bs) * bs
            crop_arr = np.zeros((pad_n, 4), np.float32)
            crop_arr[: len(crop_boxes)] = crop_boxes
            crop_valid = np.zeros(pad_n, bool)
            crop_valid[: len(crop_boxes)] = True
            captions: List[str] = []
            for start in range(0, pad_n, bs):
                crops = crop_resize_batch(
                    padded_dev, orig_hw, jnp.asarray(crop_arr[start : start + bs]),
                    cfg.captioner.crop_size,
                )
                captions.extend(
                    self.captioner.caption_crops(crops, crop_valid[start : start + bs])
                )
            for e, cap in zip(icon_plain, captions):
                e["content"] = cap
        t["caption"] = time.perf_counter() - t0

        # --- SOM overlay ---
        t0 = time.perf_counter()
        boxes_xyxy = np.array([e["bbox"] for e in elements], np.float32).reshape(-1, 4)
        cxcywh = np.stack(
            [
                (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2,
                (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2,
                boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
                boxes_xyxy[:, 3] - boxes_xyxy[:, 1],
            ],
            axis=1,
        )
        ratio = max(h, w) / cfg.som_base_resolution  # util/omniparser.py:21-27
        annotated, label_coordinates = annotate(
            image_rgb,
            cxcywh,
            text_scale=cfg.som_text_scale * ratio,
            text_thickness=max(int(cfg.som_text_thickness * ratio), 1),
            text_padding=max(int(cfg.som_text_padding * ratio), 1),
            thickness=max(int(cfg.som_thickness * ratio), 1),
        )
        if cfg.output_coord_in_ratio:
            label_coordinates = {
                k: [v[0] / w, v[1] / h, v[2] / w, v[3] / h]
                for k, v in label_coordinates.items()
            }
        t["annotate"] = time.perf_counter() - t0
        self.last_timings = t
        self._last_starting_idx = starting_idx if icon_plain else -1
        return annotated, label_coordinates, elements

    # ------------------------------------------------------------------ #

    def content_lines(self, elements: Sequence[Dict]) -> List[str]:
        """'Text Box ID i: ...' / 'Icon Box ID j: ...' lines
        (util/utils.py:453-462)."""
        lines = []
        for i, e in enumerate(elements):
            kind = "Text" if e["type"] == "text" else "Icon"
            lines.append(f"{kind} Box ID {i}: {e['content']}")
        return lines

    def warmup(self, shapes: Sequence[Tuple[int, int]] = ((1080, 1920),)) -> None:
        """Compile the device graphs ahead of serving."""
        for h, w in shapes:
            img = np.zeros((h, w, 3), np.uint8)
            self.parse_image(img)


class Omniparser:
    """Drop-in facade matching the reference (util/omniparser.py:7-32)."""

    def __init__(self, config: PipelineConfig | dict):
        if isinstance(config, dict):
            # accept the reference's config-dict shape (omniparserserver.py:29-32)
            pc = PipelineConfig()
            if "BOX_TRESHOLD" in config:
                pc = PipelineConfig(
                    detector=type(pc.detector)(box_threshold=config["BOX_TRESHOLD"]),
                )
            config = pc
        self.config = config
        self.pipeline = SOMPipeline(config)

    def parse(self, image_base64: str):
        """base64 image -> (SOM image base64, parsed content list)."""
        image = decode_base64_image(image_base64)
        annotated, _, elements = self.pipeline.parse_image(image)
        return encode_image_base64(annotated), elements
