import numpy as np
import pytest


def test_get_som_labeled_img_reference_signature(rng):
    """The reference call shape (util/omniparser.py:29-30 style) must work."""
    from omniparser_tpu.compat import get_som_labeled_img

    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    ocr_bbox = [[10, 10, 60, 25]]
    ocr_text = ["File"]
    encoded, label_coords, elements = get_som_labeled_img(
        img,
        model=None,
        BOX_TRESHOLD=0.05,
        output_coord_in_ratio=True,
        ocr_bbox=ocr_bbox,
        ocr_text=ocr_text,
        use_local_semantics=False,
        iou_threshold=0.7,
    )
    assert isinstance(encoded, str) and len(encoded) > 100
    assert isinstance(label_coords, dict)
    texts = [e for e in elements if e["type"] == "text"]
    assert texts and texts[0]["content"] == "File"
    assert texts[0]["source"] == "box_ocr_content_ocr"
    # use_local_semantics=False leaves icon content None (util/utils.py:463-465)
    icons = [e for e in elements if e["type"] == "icon"]
    assert all(e["content"] is None for e in icons)


def test_check_ocr_box_compat_import():
    from omniparser_tpu.compat import check_ocr_box
    from omniparser_tpu.ocr import NullOCR

    (texts, bb), goal = check_ocr_box(
        np.zeros((32, 32, 3), np.uint8), output_bb_format="xyxy", backend=NullOCR()
    )
    assert texts == [] and bb == []


def test_get_caption_model_processor_rejects_unknown():
    from omniparser_tpu.compat import get_caption_model_processor

    with pytest.raises(NotImplementedError):
        get_caption_model_processor("blip2")
