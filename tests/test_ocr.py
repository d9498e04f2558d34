import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniparser_tpu.config import OcrConfig
from omniparser_tpu.models.ocr import (
    CHARSET,
    NUM_CLASSES,
    JaxOCR,
    TextDetector,
    TextRecognizer,
    ctc_greedy_decode,
    extract_text_boxes,
)
from omniparser_tpu.ocr import NullOCR, check_ocr_box, make_ocr_backend


def test_ctc_greedy_decode_collapses():
    T = 8
    logits = np.full((T, NUM_CLASSES), -10.0, np.float32)
    # blank, h, h, blank, i, i, blank, blank  -> "hi"
    h_idx = CHARSET.index("h") + 1
    i_idx = CHARSET.index("i") + 1
    seq = [0, h_idx, h_idx, 0, i_idx, i_idx, 0, 0]
    for t, c in enumerate(seq):
        logits[t, c] = 10.0
    text, conf = ctc_greedy_decode(logits)
    assert text == "hi"
    assert conf > 0.99


def test_ctc_repeated_char_needs_blank():
    l_idx = CHARSET.index("l") + 1
    logits = np.full((5, NUM_CLASSES), -10.0, np.float32)
    for t, c in enumerate([l_idx, l_idx, 0, l_idx, l_idx]):
        logits[t, c] = 10.0
    text, _ = ctc_greedy_decode(logits)
    assert text == "ll"


def test_extract_text_boxes():
    prob = np.zeros((64, 64), np.float32)
    prob[10:14, 5:25] = 0.9  # a text line blob
    prob[40:41, 40:41] = 0.9  # too small -> dropped
    boxes = extract_text_boxes(prob, min_area=4)
    assert len(boxes) == 1
    (x1, y1, x2, y2), score = boxes[0]
    assert score == pytest.approx(0.9, abs=1e-5)
    # det map is at 1/2 scale: blob [5,10,25,14] -> px *2 with unclip margin
    assert x1 < 5 * 2 < 25 * 2 < x2
    assert y1 < 10 * 2 < 14 * 2 < y2


def test_detector_output_shape():
    det = TextDetector(width=8)
    params = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = det.apply(params, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 32, 32, 1)  # 1/out_scale of the input
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_recognizer_output_shape():
    rec = TextRecognizer(width=16, layers=1)
    params = rec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)), train=False)
    out = rec.apply(params, jnp.zeros((3, 32, 128, 3)), train=False)
    assert out.shape == (3, 32, NUM_CLASSES)


def test_jax_ocr_backend_end_to_end(rng):
    cfg = OcrConfig(det_imgsz=128, rec_max_width=64, text_threshold=0.0)
    ocr = JaxOCR(cfg)
    img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
    texts, boxes = ocr.recognize(img)
    # random weights: any detections must be well-formed
    assert len(texts) == len(boxes)
    for b in boxes:
        x1, y1, x2, y2 = b
        assert 0 <= x1 < x2 <= 120 and 0 <= y1 < y2 <= 100


def test_null_backend_and_registry():
    assert isinstance(make_ocr_backend(OcrConfig(backend="null")), NullOCR)
    with pytest.raises(ValueError):
        make_ocr_backend(OcrConfig(backend="nope"))


def test_check_ocr_box_signature(rng):
    img = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
    backend = NullOCR()
    (texts, bb), goal = check_ocr_box(img, output_bb_format="xywh", backend=backend)
    assert texts == [] and bb == [] and goal is None


def test_jax_ocr_loads_trained_weights(tmp_path, rng):
    """Train-save-load loop: fine-tuned OCR nets restore into the backend
    (closes the PipelineConfig.ocr_weights path end to end)."""
    import jax

    from omniparser_tpu.weights.checkpoints import save_checkpoint

    cfg = OcrConfig(det_imgsz=128, rec_max_width=64)
    trained = JaxOCR(cfg)  # pretend these params were fine-tuned
    marked_det = jax.tree.map(lambda x: np.asarray(x) + 1.0, trained.det_params)
    path = save_checkpoint(str(tmp_path / "ocr"), {
        "det": marked_det,
        "rec": jax.tree.map(np.asarray, trained.rec_params),
    })

    loaded = JaxOCR(cfg, weights=path)
    leaf = jax.tree_util.tree_leaves(loaded.det_params)[0]
    ref = jax.tree_util.tree_leaves(trained.det_params)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref) + 1.0)
    # and it still runs end to end
    img = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
    texts, boxes = loaded.recognize(img)
    assert len(texts) == len(boxes)


def test_easyocr_arch_end_to_end(rng):
    """OcrConfig.arch='easyocr' (CRAFT + VGG-BiLSTM-CTC, the reference's OCR
    stack) runs the same recognize() path end to end (random init)."""
    cfg = OcrConfig(arch="easyocr", det_imgsz=128, rec_height=64,
                    rec_max_width=128, text_threshold=0.0)
    ocr = JaxOCR(cfg)
    from omniparser_tpu.models.ocr_easy import EASYOCR_EN_CHARSET

    assert ocr.charset == EASYOCR_EN_CHARSET
    img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
    texts, boxes = ocr.recognize(img)
    assert len(texts) == len(boxes)
    for b in boxes:
        x1, y1, x2, y2 = b
        assert 0 <= x1 < x2 <= 120 and 0 <= y1 < y2 <= 100
