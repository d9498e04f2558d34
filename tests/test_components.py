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


def test_jax_ocr_device_components_parity():
    """JaxOCR with device_components=True matches the host-CC path on a
    rendered GUI scene (same texts + boxes end to end)."""
    import dataclasses

    from omniparser_tpu.config import OcrConfig
    from omniparser_tpu.models.ocr import JaxOCR, default_ocr_weights
    from omniparser_tpu.train.synth_gui import render_gui_scene

    cfg_dev = OcrConfig(backend="jax", device_components=True)
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
