import numpy as np
import jax
import pytest

from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
from omniparser_tpu.parallel.mesh import make_mesh
from omniparser_tpu.parallel.sharded_parse import ShardedParse
from omniparser_tpu.pipeline import SOMPipeline


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=4, tp=2)


@pytest.fixture(scope="module")
def pipeline():
    # tiny but complete: null OCR keeps host CC out; florence-tiny captions
    from omniparser_tpu.models.florence2 import FlorenceCaptioner
    from tests.test_florence import TINY

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=128, max_detections=16),
        captioner=CaptionerConfig(batch_size=8, crop_size=32, max_new_tokens=4),
        ocr=OcrConfig(backend="null"),
        # random-init seed-0: this test pins sharded-vs-single GRAPH
        # parity at tight tolerance; the trained det_synth checkpoint's
        # DFL decode amplifies bf16 batching noise on noise images
        # (like test_golden, which also pins None)
        detector_weights=None,
    )
    cap = FlorenceCaptioner(cfg.captioner, dims=TINY)
    return SOMPipeline(cfg, captioner=cap)


def test_sharded_parse_matches_single(mesh, pipeline, rng):
    sp = ShardedParse(pipeline, mesh)
    images = [rng.integers(0, 255, (100, 120, 3), dtype=np.uint8) for _ in range(4)]
    batched = sp.parse_images(images)
    assert len(batched) == 4
    for img, (annotated, coords, elements) in zip(images, batched):
        # per-image single path must produce identical element geometry
        _, _, single = pipeline.parse_image(img)
        assert len(elements) == len(single)
        for a, b in zip(elements, single):
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-5)
            assert a["type"] == b["type"] and a["source"] == b["source"]
            assert a["content"] == b["content"]


def test_sharded_parse_pads_to_dp(mesh, pipeline, rng):
    sp = ShardedParse(pipeline, mesh)
    images = [rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(3)]
    results = sp.parse_images(images)  # 3 -> padded to 4 internally
    assert len(results) == 3
