"""ops/components.device_components vs the host oracle
(utils/hostops.extract_components): exact box/area/order parity on
synthetic probability maps."""

import numpy as np
import pytest

from omniparser_tpu.ops.components import device_components, quantize_u8_parity
from omniparser_tpu.utils.hostops import extract_components


def _rand_map(rng, h, w, n_rects, noise=0.0):
    prob = np.zeros((h, w), np.float32)
    for _ in range(n_rects):
        rh = int(rng.integers(1, max(h // 6, 2)))
        rw = int(rng.integers(1, max(w // 3, 2)))
        y = int(rng.integers(0, h - rh))
        x = int(rng.integers(0, w - rw))
        prob[y : y + rh, x : x + rw] = rng.uniform(0.35, 1.0)
    if noise:
        sp = rng.random((h, w)) < noise
        prob[sp] = rng.uniform(0.31, 1.0, sp.sum())
    return prob


def _host(prob, thr=0.3, min_area=4, min_score=0.3, max_out=1024):
    return extract_components(prob, thr, min_area, min_score, max_out)


def _dev(prob, thr=0.3, min_area=4, min_score=0.3, max_out=1024):
    out = {k: np.asarray(v) for k, v in device_components(
        prob, thr, min_score, min_area=min_area, max_out=max_out
    ).items()}
    n = int(out["count"])
    return [
        (tuple(int(v) for v in out["boxes"][i]), float(out["scores"][i]),
         int(out["areas"][i]))
        for i in range(n)
    ], int(out["overflow"])


@pytest.mark.parametrize("seed", range(6))
def test_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    prob = _rand_map(rng, 96, 160, int(rng.integers(1, 14)),
                     noise=0.002 if seed % 2 else 0.0)
    host = _host(prob)
    dev, overflow = _dev(prob)
    assert overflow == 0
    assert len(dev) == len(host)
    for (db, ds, da), (hb, hs, ha) in zip(dev, host):
        assert db == hb
        assert da == ha
        assert abs(ds - hs) < 1e-5


def test_snake_component():
    """Non-convex component needing several propagation iterations."""
    prob = np.zeros((40, 40), np.float32)
    # S-shaped path
    prob[2, 2:35] = 0.9
    prob[2:20, 34] = 0.9
    prob[19, 4:35] = 0.9
    prob[19:36, 4] = 0.9
    prob[35, 4:30] = 0.9
    host = _host(prob, min_area=1)
    dev, _ = _dev(prob, min_area=1)
    assert len(host) == 1 and len(dev) == 1
    assert dev[0][0] == host[0][0]
    assert dev[0][2] == host[0][2]


def test_filters_and_order():
    prob = np.zeros((64, 64), np.float32)
    prob[2:4, 2:30] = 0.9     # kept (area 56)
    prob[10, 10] = 0.9        # dropped: area 1 < 4
    prob[20:24, 5:9] = 0.31   # kept (score .31 > .3)
    prob[30:34, 5:9] = 0.25   # dropped: below bin threshold entirely
    prob[40:44, 40:60] = 0.9  # kept
    host = _host(prob)
    dev, overflow = _dev(prob)
    assert overflow == 0
    assert [b for b, _, _ in dev] == [b for b, _, _ in host]
    assert len(dev) == 3


def test_max_out_cap_and_overflow():
    prob = np.zeros((40, 100), np.float32)
    for i in range(8):
        prob[i * 5 : i * 5 + 3, 0:10] = 0.9
        prob[i * 5 : i * 5 + 3, 50:60] = 0.9
    host = _host(prob, max_out=5)
    dev, overflow = _dev(prob, max_out=5)
    assert len(dev) == len(host) == 5
    assert [b for b, _, _ in dev] == [b for b, _, _ in host]
    assert overflow == 16 - 5


def test_quantize_parity():
    rng = np.random.default_rng(7)
    prob = _rand_map(rng, 64, 96, 6).astype(np.float32)
    # host path binarizes the uint8-quantized download; device must match
    q_u8 = np.floor(np.clip(prob, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    host = _host(q_u8.astype(np.float32) / 255.0)
    dev, _ = _dev(np.asarray(quantize_u8_parity(prob)))
    assert len(dev) == len(host)
    for (db, ds, da), (hb, hs, ha) in zip(dev, host):
        assert db == hb and da == ha
        assert abs(ds - hs) < 1e-5


def _legacy_candidates_fp32(comps, r, pads, w, h, scale=2, unclip=2.0):
    """Slow restatement of the original candidates_from_prob loop
    (models/ocr.py pre-harmonization), at fp32 like the shared math."""
    r_f = np.float32(r)
    py, px = np.float32(pads[0]), np.float32(pads[1])
    out = []
    for (x1c, y1c, x2c, y2c), _score in comps:
        wc, hc = x2c - x1c, y2c - y1c
        margin = np.float32((unclip - 1.0) * 0.5) * np.float32(min(wc, hc))
        x1 = np.round((np.float32(x1c) - margin) * np.float32(scale))
        y1 = np.round((np.float32(y1c) - margin) * np.float32(scale))
        x2 = np.round((np.float32(x2c) + margin) * np.float32(scale))
        y2 = np.round((np.float32(y2c) + margin) * np.float32(scale))
        bx1 = max((x1 - px) / r_f, np.float32(0.0))
        by1 = max((y1 - py) / r_f, np.float32(0.0))
        bx2 = min((x2 - px) / r_f, np.float32(w))
        by2 = min((y2 - py) / r_f, np.float32(h))
        if bx2 - bx1 >= 1 and by2 - by1 >= 1:
            out.append([int(bx1), int(by1), int(bx2), int(by2)])
    return out


@pytest.mark.parametrize("seed", range(5))
def test_candidate_boxes_device_host_parity(seed):
    """candidate_boxes_from_cc (device) == candidate_boxes_np (host) ==
    the legacy loop restatement, on random component sets + letterboxes."""
    import jax.numpy as jnp

    from omniparser_tpu.ops.components import (
        candidate_boxes_from_cc, candidate_boxes_np,
    )

    rng = np.random.default_rng(seed)
    s = 480  # det input size
    uh = int(rng.integers(100, 1100))
    uw = int(rng.integers(100, 2000))
    r = min(s / uh, s / uw)
    pads = ((s - uh * r) / 2.0, (s - uw * r) / 2.0)
    n = int(rng.integers(0, 40))
    comps = []
    for _ in range(n):
        x1 = int(rng.integers(0, s // 2 - 10))
        y1 = int(rng.integers(0, s // 2 - 10))
        comps.append(((x1, y1, x1 + int(rng.integers(1, 60)),
                       y1 + int(rng.integers(1, 12))), 0.9))

    max_boxes = 32
    host = candidate_boxes_np(comps[:max_boxes], r, pads, uw, uh)
    legacy = _legacy_candidates_fp32(comps[:max_boxes], r, pads, uw, uh)
    assert host == legacy

    cc_boxes = np.zeros((64, 4), np.int32)
    for i, (b, _s) in enumerate(comps[:64]):
        cc_boxes[i] = b
    norm, valid, overflow = candidate_boxes_from_cc(
        jnp.asarray(cc_boxes), jnp.int32(len(comps)), jnp.float32(r),
        jnp.asarray(pads, jnp.float32), jnp.asarray([uh, uw], jnp.int32),
        max_boxes=max_boxes,
    )
    norm, valid = np.asarray(norm), np.asarray(valid)
    scale = np.array([uw, uh, uw, uh], np.float32)
    dev_px = [[int(round(v)) for v in row * scale] for row in norm[valid]]
    assert dev_px == host
    assert int(overflow) == max(len(comps) - max_boxes, 0)
    # invalid slots are zeroed (crop-gather determinism)
    assert not norm[~valid].any()


DET_W = None  # resolved lazily in the pipeline parity test


def test_pipeline_fused_candidates_parity():
    """SOMPipeline with fused_candidates=True (det-CC feeds the fused step
    on device; ONE download) produces byte-identical elements and label
    coordinates to the host-candidate path on a rendered GUI scene."""
    import dataclasses

    from omniparser_tpu.config import (
        CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig,
    )
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.train.synth_gui import render_gui_scene

    base = PipelineConfig(
        detector=DetectorConfig(default_imgsz=640, max_detections=64),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="jax", det_imgsz=960, device_components=True,
                      fused_candidates=True),
    )
    cfg_host = dataclasses.replace(
        base, ocr=dataclasses.replace(base.ocr, fused_candidates=False))
    p_fused = SOMPipeline(base)
    p_host = SOMPipeline(cfg_host)
    assert p_fused._fused_ocr and not p_host._fused_ocr

    rng = np.random.default_rng(20260817)
    for _ in range(2):
        img, _icons, _tb, _tx = render_gui_scene(rng, size=640)
        ann_f, lc_f, el_f = p_fused.parse_image(img)
        ann_h, lc_h, el_h = p_host.parse_image(img)
        assert el_f == el_h
        assert lc_f == lc_h
        np.testing.assert_array_equal(ann_f, ann_h)


def test_jax_ocr_device_components_parity():
    """JaxOCR with device_components=True matches the host-CC path on a
    rendered GUI scene (same texts + boxes end to end)."""
    import dataclasses

    from omniparser_tpu.config import OcrConfig
    from omniparser_tpu.models.ocr import JaxOCR, default_ocr_weights
    from omniparser_tpu.train.synth_gui import render_gui_scene

    cfg_dev = OcrConfig(backend="jax", det_imgsz=960, device_components=True)
    weights = default_ocr_weights(cfg_dev)
    cfg_host = dataclasses.replace(cfg_dev, device_components=False)
    ocr_dev = JaxOCR(cfg_dev, weights=weights)
    ocr_host = JaxOCR(cfg_host, weights=weights)

    rng = np.random.default_rng(4242)
    img, _icons, _tb, _tx = render_gui_scene(rng, size=640)
    t_dev, b_dev = ocr_dev.recognize(img)
    t_host, b_host = ocr_host.recognize(img)
    assert t_dev == t_host
    assert b_dev == b_host


def test_rec_block_loop_parity():
    """The block-looped recognizer (OcrConfig.rec_block: lax.fori_loop with
    a data-dependent trip count over 32-slot blocks) is byte-identical to
    the full-width rec batch on the fused device-candidate path."""
    import dataclasses

    from omniparser_tpu.config import (
        CaptionerConfig, DetectorConfig, OcrConfig, PipelineConfig,
    )
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.train.synth_gui import render_gui_scene

    base = PipelineConfig(
        detector=DetectorConfig(default_imgsz=640, max_detections=64),
        captioner=CaptionerConfig(backend="null"),
        ocr=OcrConfig(backend="jax", det_imgsz=960, device_components=True,
                      fused_candidates=True, rec_block=32),
    )
    cfg_full = dataclasses.replace(
        base, ocr=dataclasses.replace(base.ocr, rec_block=0))
    p_blk = SOMPipeline(base)
    p_full = SOMPipeline(cfg_full)

    rng = np.random.default_rng(20260818)
    for _ in range(2):
        img, _icons, _tb, _tx = render_gui_scene(rng, size=640)
        ann_b, lc_b, el_b = p_blk.parse_image(img)
        ann_f, lc_f, el_f = p_full.parse_image(img)
        assert el_b == el_f
        assert lc_b == lc_f
        np.testing.assert_array_equal(ann_b, ann_f)
