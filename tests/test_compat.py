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
        get_caption_model_processor("llava")


def test_box_format_helpers():
    from omniparser_tpu.compat import get_xywh, get_xyxy, get_xywh_yolo

    quad = [[10.2, 20.7], [50, 20.7], [50.9, 40.1], [10.2, 40.1]]
    assert get_xywh(quad) == (10, 20, 40, 19)
    assert get_xyxy(quad) == (10, 20, 50, 40)
    assert get_xywh_yolo([10.2, 20.7, 50.9, 40.1]) == (10, 20, 40, 19)


def test_remove_overlap_v1_matches_oracle(rng):
    from omniparser_tpu.compat import remove_overlap
    from tests import oracles
    from tests.conftest import random_boxes

    for trial in range(6):
        boxes = [list(map(float, b)) for b in random_boxes(rng, 12, max_size=0.3)]
        ocr = [list(map(float, b)) for b in random_boxes(rng, 4, max_size=0.15)]
        for ob in (None, ocr):
            got = remove_overlap(boxes, 0.5, ocr_bbox=ob)
            want = oracles.remove_overlap_v1_oracle(boxes, 0.5, ocr_bbox=ob)
            got_r = [tuple(round(float(x), 5) for x in b)
                     for b in np.asarray(got, np.float64).reshape(-1, 4)]
            want_r = [tuple(round(float(x), 5) for x in b)
                      for b in np.asarray(want, np.float64).reshape(-1, 4)]
            assert got_r == want_r, f"trial {trial} ocr={ob is not None}"


def test_predict_yolo_compat(rng):
    import jax

    from omniparser_tpu.compat import get_yolo_model, predict_yolo
    from omniparser_tpu.models.yolov8 import Detector

    det = Detector(variant="n", num_classes=1, imgsz=128, max_det=8)
    model = (det, det.init_params(jax.random.PRNGKey(0)))
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    boxes, conf, phrases = predict_yolo(model, img, box_threshold=0.05,
                                        iou_threshold=0.1)
    assert boxes.shape[1] == 4 and len(conf) == len(boxes) == len(phrases)
    if len(boxes):
        assert (boxes[:, 0] <= 128).all() and (boxes[:, 1] <= 96).all()
        assert phrases == [str(i) for i in range(len(boxes))]


def test_get_som_labeled_img_reuses_pipeline(rng):
    """Repeated calls must reuse the cached pipeline (no recompile storm)."""
    from omniparser_tpu import compat

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    kw = dict(BOX_TRESHOLD=0.05, ocr_bbox=[[5, 5, 30, 15]], ocr_text=["x"],
              use_local_semantics=False, iou_threshold=0.7)
    compat.get_som_labeled_img(img, **kw)
    n_pipelines = len(compat._PIPELINE_CACHE)
    compat.get_som_labeled_img(img, **kw)
    assert len(compat._PIPELINE_CACHE) == n_pipelines


def test_threshold_sweep_reuses_pipeline(rng):
    """Thresholds are traced per-call values, not cache-key material."""
    from omniparser_tpu import compat

    compat._PIPELINE_CACHE.clear()
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    for thr in (0.01, 0.03, 0.05):
        compat.get_som_labeled_img(img, BOX_TRESHOLD=thr, ocr_bbox=[[5, 5, 30, 15]],
                                   ocr_text=["x"], use_local_semantics=False,
                                   iou_threshold=0.5 + thr)
    # one entry for this (cfg, models) combination regardless of thresholds
    assert len(compat._PIPELINE_CACHE) == 1


def test_get_parsed_content_icon_compat(rng):
    """Reference signature (util/utils.py:78-122) over the TPU captioner."""
    from omniparser_tpu.compat import get_parsed_content_icon

    class StubCaptioner:
        def caption_crops(self, crops, valid):
            return [f"cap{i}" for i in range(int(valid.sum()))]

    img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
    boxes = np.array([[0.1, 0.1, 0.3, 0.3], [0.4, 0.4, 0.6, 0.6],
                      [0.7, 0.7, 0.9, 0.9]], np.float32)
    caps = get_parsed_content_icon(boxes, starting_idx=1, image_source=img,
                                   caption_model_processor=StubCaptioner(),
                                   batch_size=2)
    assert caps == ["cap0", "cap1"]  # 2 boxes after starting_idx, one batch of 2
    assert get_parsed_content_icon(boxes[:0], 0, img, StubCaptioner()) == []


def test_load_image_legacy(tmp_path, rng):
    """DINO-style loader (util/utils.py:312-323): shorter side -> 800 px
    (capped at 1333 on the long side), ImageNet-normalized CHW output."""
    from PIL import Image

    from omniparser_tpu.compat import load_image

    img = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    src, transformed = load_image(str(p))
    np.testing.assert_array_equal(src, img)
    assert transformed.shape[0] == 3 and transformed.dtype == np.float32
    # 90x160 -> scale limited by long side: 1333/160 < 800/90
    c, th, tw = transformed.shape
    assert tw == 1333 and th == round(90 * 1333 / 160)
    # a mid-gray pixel normalizes near (0.5-mean)/std
    gray = Image.fromarray(np.full((100, 100, 3), 128, np.uint8))
    p2 = tmp_path / "g.png"
    gray.save(p2)
    _, t2 = load_image(str(p2))
    np.testing.assert_allclose(
        t2[:, 0, 0], (128 / 255 - np.array([0.485, 0.456, 0.406]))
        / np.array([0.229, 0.224, 0.225]), atol=1e-5)


def test_predict_grounded(rng):
    """Grounded predict (util/utils.py:357-375 signature): boxes from the
    detector, phrases grounded against the '.'-separated caption query by
    crop-caption token overlap, logits = conf * similarity."""
    import jax

    from omniparser_tpu.compat import predict
    from omniparser_tpu.models.yolov8 import Detector

    det = Detector(variant="n", num_classes=1, imgsz=128, max_det=8)
    model_pair = (det, det.init_params(jax.random.PRNGKey(0)))

    class FakeCaptioner:
        """caption_crops protocol: alternating captions."""
        def caption_crops(self, crops, valid):
            n = int(np.sum(valid))
            return ["a save button icon" if i % 2 == 0 else "blue banner"
                    for i in range(n)]

    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    model = {"model": model_pair, "processor": FakeCaptioner()}
    boxes, logits, phrases = predict(model, img, "save button . search bar",
                                     box_threshold=0.01, text_threshold=0.5)
    assert boxes.shape[1] == 4 and len(logits) == len(boxes) == len(phrases)
    assert all(p == "save button" for p in phrases)  # banner boxes filtered
    assert all(0 <= v <= 1 for v in logits)
    # text_threshold=1.1 filters everything
    b2, l2, p2 = predict(model, img, "save button", 0.01, 1.1)
    assert len(b2) == 0 and len(p2) == 0
