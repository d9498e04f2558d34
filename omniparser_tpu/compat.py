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


def get_yolo_model(model_path: Optional[str] = None, variant: str = "n"):
    """Reference: ultralytics YOLO(model_path) (util/utils.py:71-75).
    Returns (Detector, params) — pass as `model=` to get_som_labeled_img."""
    import jax

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
    Returns a FlorenceCaptioner (the 'model'+'processor' pair fused)."""
    if model_name != "florence2":
        raise NotImplementedError(
            f"caption model {model_name!r} not implemented yet (florence2 only)"
        )
    from omniparser_tpu.models.florence2 import FlorenceCaptioner

    cfg = CaptionerConfig()
    if model_name_or_path:
        return FlorenceCaptioner.from_checkpoint(model_name_or_path, cfg)
    return FlorenceCaptioner(cfg)


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

    base = PipelineConfig()
    cfg = dataclasses.replace(
        base,
        iou_threshold=iou_threshold,
        use_local_semantics=use_local_semantics,
        output_coord_in_ratio=output_coord_in_ratio,
        detector=dataclasses.replace(base.detector, box_threshold=BOX_TRESHOLD),
        captioner=dataclasses.replace(
            base.captioner, batch_size=batch_size,
            backend="florence" if (use_local_semantics and caption_model_processor)
            else "null",
        ),
        ocr=dataclasses.replace(base.ocr, backend="null"),  # ocr passed in
    )

    detector = detector_params = None
    if model is not None:
        detector, detector_params = model

    class _ProvidedOCR:
        def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
            return list(ocr_text), [list(b) for b in (ocr_bbox or [])]

    pipeline = SOMPipeline(
        cfg, detector=detector, detector_params=detector_params,
        captioner=caption_model_processor, ocr=_ProvidedOCR(),
    )
    overrides = {}
    if draw_bbox_config:
        overrides = draw_bbox_config
    annotated, label_coordinates, elements = pipeline.parse_image(image_rgb)
    return encode_image_base64(annotated), label_coordinates, elements
