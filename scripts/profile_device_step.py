"""Decompose the fused parse's device_step (VERDICT r3 #5).

BENCH_r03 measured device_step = 169 ms for only ~137 GF (MFU 0.73%).
Standalone stage dispatches CANNOT be timed naively on the tunneled axon
backend: per-dispatch+sync overhead is ~25 ms and `block_until_ready`
returns before the computation actually finishes, so every naive number
collapses to the sync overhead.  This script therefore measures each
stage with the LOOP-DELTA method: run the stage n times inside one
`lax.scan` (with a carry-fed perturbation so XLA cannot CSE the
iterations), force a real sync with `jax.device_get` on a scalar, and
report (t_n - t_1) / (n - 1) — pure device compute, no dispatch/sync
overhead, no download time.

Run on an idle host (never while bench/training runs):
    python scripts/profile_device_step.py [--loops 8] [--rounds 6]
Prints one JSON line: per-stage ms plus the rtt/sync floor and the
production fused-step wall time for reference.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, rounds=6):
    jax.device_get(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def loop_delta(stage_fn, n_loops, rounds, *args):
    """stage_fn(carry, *args) -> scalar; returns ms per iteration."""

    def make(n):
        @jax.jit
        def f(*a):
            def body(c, _):
                return c + stage_fn(c, *a), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return f

    t1 = _timed(make(1), *args, rounds=rounds)
    tn = _timed(make(n_loops), *args, rounds=rounds)
    return max(tn - t1, 0.0) / (n_loops - 1) * 1000.0, t1 * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--image", default=None)
    args = ap.parse_args()

    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.utils.image import load_image_rgb

    cfg = PipelineConfig()
    p = SOMPipeline(cfg)
    img_path = args.image or sorted(
        glob.glob("/root/reference/imgs/windows*.png"))[0]
    img = load_image_rgb(img_path)
    ctx = p._stage_upload(img)
    padded, hw = ctx["padded_dev"], ctx["orig_hw"]
    true_hw = jnp.asarray([ctx["h"], ctx["w"]], jnp.int32)
    results = {}
    K, R = args.loops, args.rounds

    # sync/RTT floor for reading the t1 columns
    results["sync_floor_ms"], _ = loop_delta(
        lambda c: c * 0.0, 64, R)
    noop_t1 = _timed(jax.jit(lambda: jnp.float32(0)), rounds=R)
    results["rtt_ms"] = round(noop_t1 * 1000.0, 2)

    det = p.detector
    det_vars = p.detector_params

    def det_stage(c):
        b, s, v = det.detect_graph(
            det_vars, padded, hw, jnp.float32(0.05) + c * 1e-12,
            jnp.float32(0.1))
        return b.sum() * 0.0 + s.sum() * 1e-9

    results["det_ms"], results["det_t1_ms"] = map(
        lambda x: round(x, 2), loop_delta(det_stage, K, R))

    jocr = p._jax_ocr
    det_imgsz = cfg.ocr.det_imgsz
    from omniparser_tpu.ops.components import (
        candidate_boxes_from_cc,
        device_components,
        quantize_u8_parity,
    )
    from omniparser_tpu.ops.preprocess import letterbox

    def ocrdet_stage(c):
        im, _r, _pads = letterbox(padded, hw, det_imgsz)
        prob = jnp.clip(
            jocr.det.apply(jocr.det_params, im[None], train=False)[0, ..., 0],
            0.0, 1.0)
        cc = device_components(quantize_u8_parity(prob),
                               0.3 + c * 1e-12, 0.3, min_area=4,
                               max_out=1024, pre_cap=1024)
        return cc["count"].astype(jnp.float32) * 1e-9

    results["ocrdet_cc_ms"], results["ocrdet_cc_t1_ms"] = map(
        lambda x: round(x, 2), loop_delta(ocrdet_stage, K, R))

    # candidates + rec one block + merge + caption crops, all tiny-input
    cc0 = jocr._det_cc_full(jocr.det_params, padded, hw)
    r0, pads0 = jocr.dispatch_det(padded, hw,
                                  hw_host=(ctx["uh"], ctx["uw"]))[1:]
    boxes_norm, valid, _ = candidate_boxes_from_cc(
        cc0["boxes"], cc0["count"], jnp.float32(r0),
        jnp.asarray(pads0, jnp.float32), hw, max_boxes=cfg.ocr.max_text_boxes)
    n_cand = int(jax.device_get(valid).sum())

    def cand_stage(c):
        b, v, o = candidate_boxes_from_cc(
            cc0["boxes"], cc0["count"], jnp.float32(r0) + c * 1e-12,
            jnp.asarray(pads0, jnp.float32), hw,
            max_boxes=cfg.ocr.max_text_boxes)
        return b.sum() * 1e-9

    results["cc_candidates_ms"], _ = map(
        lambda x: round(x, 3), loop_delta(cand_stage, K, R))

    from omniparser_tpu.models.ocr import ctc_device_stats
    from omniparser_tpu.ops.preprocess import crop_lines_batch, crop_resize_batch

    blk = cfg.ocr.rec_block
    rec_hw = (cfg.ocr.rec_height, cfg.ocr.rec_max_width)

    def rec_stage(c):
        crops = crop_lines_batch(padded, hw, boxes_norm[:blk] + c * 1e-12,
                                 rec_hw)
        logits = jocr.rec.apply(jocr.rec_params,
                                jocr.rec_preprocess(crops), train=False)
        return logits.sum().astype(jnp.float32) * 1e-9

    results[f"rec_block{blk}_ms"], _ = map(
        lambda x: round(x, 2), loop_delta(rec_stage, K, R))
    results["rec_blocks_needed"] = max(-(-n_cand // blk), 1)

    K_cap = cfg.captioner.batch_size
    cap_boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.2, 0.2]], jnp.float32),
                         (K_cap, 1))

    def crop_stage(c):
        crops = crop_resize_batch(padded, hw, cap_boxes + c * 1e-12,
                                  cfg.captioner.crop_size)
        return crops.sum().astype(jnp.float32) * 1e-9

    results[f"cap_crop{K_cap}_ms"], _ = map(
        lambda x: round(x, 3), loop_delta(crop_stage, K, R))

    from omniparser_tpu.ops.overlap import merge_icons_and_ocr

    det_out = jax.jit(lambda: det.detect_graph(
        det_vars, padded, hw, jnp.float32(0.05), jnp.float32(0.1)))()
    db, ds, dv = det_out[:3]

    def merge_stage(c):
        r = merge_icons_and_ocr(db + c * 1e-12, dv, boxes_norm, valid,
                                jnp.float32(cfg.iou_threshold))
        return r.icon_keep.sum().astype(jnp.float32) * 1e-9

    results["merge_ms"], _ = map(
        lambda x: round(x, 3), loop_delta(merge_stage, K, R))

    # production fused step wall (dispatch + download incl. sync), for
    # reference against the bench's device_step
    fut = jocr.dispatch_det(padded, hw, hw_host=(ctx["uh"], ctx["uw"]))
    cc, r2, pads2 = fut

    def fused_call():
        out = p.fused(
            p.detector_params, jocr.rec_params,
            p.fused.captioner.params if p.fused.captioner else 0,
            padded, hw, true_hw, cc["boxes"], cc["count"],
            cfg.detector.box_threshold, cfg.detector.nms_iou_threshold,
            cfg.iou_threshold, cfg.ocr.text_threshold,
            lb_r=r2, lb_pads=pads2)
        out.pop("crops", None)
        return out

    jax.device_get(fused_call())
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        jax.device_get(fused_call())
        ts.append(time.perf_counter() - t0)
    results["fused_wall_ms"] = round(float(np.median(ts)) * 1000.0, 1)

    results["image"] = img_path
    results["n_ocr_candidates"] = n_cand
    print(json.dumps(results))


if __name__ == "__main__":
    main()
