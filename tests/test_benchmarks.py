"""Latency/throughput checks as pytest markers (SURVEY.md §4).

Bounds are deliberately loose sanity rails (CPU backend, shared CI hosts):
they catch order-of-magnitude regressions (e.g. an accidental recompile per
call or a host loop sneaking back into a device path), not small drift.
Run explicitly with `-m benchmark`; excluded from the default suite via
deselection when time-sensitive.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.benchmark


def _timeit(fn, n=10):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def test_merge_is_compiled_once(rng):
    """Repeated merges must not retrace (sub-ms steady state on CPU)."""
    from omniparser_tpu.ops.overlap import merge_icons_and_ocr
    from tests.conftest import random_boxes

    ib = jnp.asarray(random_boxes(rng, 512))
    ob = jnp.asarray(random_boxes(rng, 128))
    iv, ov = jnp.ones(512, bool), jnp.ones(128, bool)

    def run():
        merge_icons_and_ocr(ib, iv, ob, ov, 0.7).icon_keep.block_until_ready()

    dt = _timeit(run)
    assert dt < 0.25, f"merge step {dt*1000:.1f} ms — retracing?"


def test_nms_steady_state(rng):
    from omniparser_tpu.ops.nms import nms_fixed_shape
    from tests.conftest import random_boxes

    boxes = jnp.asarray(random_boxes(rng, 512))
    scores = jnp.asarray(rng.uniform(0, 1, 512).astype(np.float32))
    valid = jnp.ones(512, bool)

    def run():
        nms_fixed_shape(boxes, scores, valid, 0.1, 512)[3].block_until_ready()

    dt = _timeit(run)
    assert dt < 1.0, f"nms step {dt*1000:.1f} ms"


def test_crop_gather_steady_state(rng):
    from omniparser_tpu.ops.preprocess import crop_resize_batch, pad_to_bucket
    from tests.conftest import random_boxes

    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    padded, _ = pad_to_bucket(img, 512, 512)
    pd = jnp.asarray(padded)
    boxes = jnp.asarray(random_boxes(rng, 128))

    def run():
        crop_resize_batch(pd, jnp.asarray([512, 512]), boxes, 64).block_until_ready()

    dt = _timeit(run)
    assert dt < 1.0, f"crop gather {dt*1000:.1f} ms"


def test_parse_image_no_percall_compile(rng):
    """Back-to-back parses of same-shape images must be compile-free."""
    from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=160, max_detections=16),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="null"),
    )
    p = SOMPipeline(cfg)
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    p.parse_image(img)
    dt = _timeit(lambda: p.parse_image(img), n=5)
    assert dt < 2.0, f"steady parse {dt:.2f} s — per-call compile?"
