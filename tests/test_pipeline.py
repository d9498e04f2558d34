import numpy as np
import pytest

from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
from omniparser_tpu.pipeline import Omniparser, SOMPipeline
from omniparser_tpu.utils.image import decode_base64_image, encode_image_base64

SOURCES = {"box_ocr_content_ocr", "box_yolo_content_ocr", "box_yolo_content_yolo"}


@pytest.fixture(scope="module")
def small_config():
    return PipelineConfig(
        detector=DetectorConfig(default_imgsz=160, max_detections=32, box_threshold=0.05),
        captioner=CaptionerConfig(backend="null", batch_size=8, crop_size=32),
        ocr=OcrConfig(backend="null"),
    )


@pytest.fixture(scope="module")
def pipeline(small_config):
    return SOMPipeline(small_config)


class FakeOCR:
    def __init__(self, texts, boxes):
        self.texts, self.boxes = texts, boxes

    def recognize(self, image_rgb, padded_dev=None, orig_hw=None):
        return self.texts, self.boxes


def test_parse_image_schema(pipeline, rng):
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    annotated, label_coords, elements = pipeline.parse_image(img)
    assert annotated.shape == img.shape and annotated.dtype == np.uint8
    for i, e in enumerate(elements):
        assert set(e) == {"type", "bbox", "interactivity", "content", "source"}
        assert e["type"] in ("text", "icon")
        assert e["source"] in SOURCES
        assert len(e["bbox"]) == 4
        assert all(0.0 <= v <= 1.0 for v in e["bbox"])
    assert set(label_coords) == {str(i) for i in range(len(elements))}
    # ratio coords (output_coord_in_ratio=True default)
    for v in label_coords.values():
        assert all(-0.01 <= x <= 1.01 for x in v)


def test_element_ordering_content_none_last(small_config, rng):
    # OCR text that overlaps nothing: text elems first, captioned icons last
    ocr = FakeOCR(["hello"], [[5, 5, 40, 15]])
    p = SOMPipeline(small_config, ocr=ocr)
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    _, _, elements = p.parse_image(img)
    kinds = [e["type"] for e in elements]
    if "text" in kinds and "icon" in kinds:
        assert kinds.index("icon") > kinds.index("text")
    # every element ends with content set (captioner fills None)
    assert all(e["content"] is not None for e in elements)


def test_content_lines_format(pipeline, rng):
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    _, _, elements = pipeline.parse_image(img)
    lines = pipeline.content_lines(elements)
    for i, line in enumerate(lines):
        assert line.startswith(("Text Box ID", "Icon Box ID"))
        assert f"ID {i}:" in line


def test_omniparser_facade_base64_roundtrip(small_config, rng):
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    b64 = encode_image_base64(img)
    parser = Omniparser.__new__(Omniparser)
    parser.config = small_config
    parser.pipeline = SOMPipeline(small_config)
    som_b64, elements = parser.parse(b64)
    out = decode_base64_image(som_b64)
    assert out.shape == img.shape
    assert isinstance(elements, list)


def test_timings_recorded(pipeline, rng):
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    pipeline.parse_image(img)
    assert {"upload", "ocr_detect", "device_step", "assemble", "annotate"} <= set(
        pipeline.last_timings
    )


def test_max_upload_side_downscale(rng):
    """Capped upload: geometry stays normalized, overlay at full res."""
    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=160, max_detections=16),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
        max_upload_side=128,
    )
    p = SOMPipeline(cfg)
    img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    annotated, coords, elements = p.parse_image(img)
    assert annotated.shape == img.shape  # overlay on the original
    for e in elements:
        assert all(0.0 <= v <= 1.0 for v in e["bbox"])


def test_pipeline_with_blip2_captioner(rng):
    """BLIP-2 (non-fusable, beam decode) as the caption backend."""
    from omniparser_tpu.models.blip2 import TINY_BLIP2, Blip2Captioner

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=160, max_detections=16, box_threshold=0.05),
        captioner=CaptionerConfig(backend="blip2", batch_size=4, crop_size=28,
                                  max_new_tokens=4),
        ocr=OcrConfig(backend="null"),
    )
    cap = Blip2Captioner(cfg.captioner, dims=TINY_BLIP2, num_beams=2)
    p = SOMPipeline(cfg, captioner=cap)
    img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
    _, _, elements = p.parse_image(img)
    icons = [e for e in elements if e["type"] == "icon"]
    assert all(isinstance(e["content"], str) for e in icons)


def test_annotate_label_positions(rng):
    from omniparser_tpu.annotate import annotate

    img = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    boxes = np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]], np.float32)
    scene, coords = annotate(img, boxes)
    assert scene.shape == img.shape
    assert set(coords) == {"0", "1"}
    # xywh pixel coords
    x, y, w, h = coords["0"]
    assert w == pytest.approx(0.2 * 200, abs=1) and h == pytest.approx(0.2 * 200, abs=1)


def test_place_labels_batch_matches_loop(rng):
    """The vectorized all-boxes placement must pick the identical candidate
    (text anchor AND bg box) as the per-box place_label loop, including the
    in-image rejection, the 0.3 overlap rejection, and the last-candidate
    fallback."""
    from omniparser_tpu.annotate import place_label, place_labels_batch

    for trial in range(20):
        n = int(rng.integers(1, 60))
        W, H = int(rng.integers(100, 800)), int(rng.integers(100, 800))
        x1 = rng.integers(-20, W, n)
        y1 = rng.integers(-20, H, n)
        boxes = np.stack([x1, y1,
                          x1 + rng.integers(1, 120, n),
                          y1 + rng.integers(1, 80, n)], 1).astype(int)
        tws = rng.integers(4, 40, n).astype(int)
        ths = rng.integers(4, 18, n).astype(int)
        pad = int(rng.integers(1, 8))
        txs, tys, bgs = place_labels_batch(pad, tws, ths, boxes, (W, H))
        det_list = [tuple(b) for b in boxes]
        for i in range(n):
            tx, ty, bg = place_label(
                pad, int(tws[i]), int(ths[i]), det_list[i], det_list, (W, H))
            assert (txs[i], tys[i]) == (tx, ty), (trial, i)
            assert tuple(bgs[i]) == tuple(bg), (trial, i)


def test_max_som_side_downscales_overlay_only(rng):
    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=160, max_detections=16),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
        max_som_side=100,
        output_coord_in_ratio=False,
    )
    p = SOMPipeline(cfg)
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    annotated, coords, elements = p.parse_image(img)
    assert max(annotated.shape[:2]) == 100  # overlay downscaled
    # coordinates stay in the ORIGINAL pixel frame
    for v in coords.values():
        x, y, w, h = v
        assert 0 <= x <= 300 and 0 <= y <= 200


def test_parse_batch_matches_single_with_captions(rng):
    """parse_batch's cross-image batched caption decode + deferred caption
    fill must reproduce parse_image exactly (boxes AND caption content) —
    a parse must not depend on batching (util/omniparser.py:16-32).  The
    tiny _DECODE_CHUNK forces the multi-chunk decode path too."""
    from omniparser_tpu.models.florence2 import FlorenceCaptioner
    from tests.test_florence import TINY

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=128, max_detections=16,
                                box_threshold=0.01),
        captioner=CaptionerConfig(batch_size=8, crop_size=32,
                                  max_new_tokens=4),
        ocr=OcrConfig(backend="null"),
        detector_weights=None,  # random-init: boxes on noise images
    )
    p = SOMPipeline(cfg, captioner=FlorenceCaptioner(cfg.captioner, dims=TINY))
    p._DECODE_CHUNK = 4  # force >1 decode dispatch for the batch
    images = [rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
              for _ in range(3)]
    batched = p.parse_batch(images)
    assert len(batched) == 3
    saw_caption = False
    for img, (ann_b, coords_b, el_b) in zip(images, batched):
        ann_s, coords_s, el_s = p.parse_image(img)
        assert len(el_b) == len(el_s)
        for a, b in zip(el_b, el_s):
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-5)
            assert a["content"] == b["content"] and a["source"] == b["source"]
            saw_caption |= (a["source"] == "box_yolo_content_yolo"
                            and a["content"] is not None)
        np.testing.assert_array_equal(ann_b, ann_s)
        assert coords_b == coords_s
    assert saw_caption, "no captions decoded — the batched path went untested"
