"""Decompose the fused parse's device_step (VERDICT r3 #5).

BENCH_r03 measured device_step = 169 ms for only ~137 GF (MFU 0.73%),
i.e. the fused graph is latency/gather-bound, not FLOP-bound.  This
script times the graph's constituent stages as standalone jitted
dispatches on the same real screenshots, so PERF.md can carry a measured
in-graph breakdown instead of a guess:

    det        letterbox + YOLO forward + decode + prefilter + NMS
    rec[k]     k-block OCR line recognition (crop_lines + CTC stats)
    crop       caption crop-gather (crop_resize_batch at K slots)
    cc         OCR det net + device connected components (dispatch #1)
    merge      pairwise overlap/merge masks + caption compaction
    fused      the production FusedParseStep graph (reference timing)

Standalone stage times do NOT sum to the fused time exactly (XLA fuses
across stages and hides some latency), but they bound each stage's cost
and expose the dominant term.

Run on an idle host (never while bench/training runs):
    python scripts/profile_device_step.py [--rounds 5]
Prints one JSON line per stage and a summary table.
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


def _bench(fn, *args, rounds=5):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, out)
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready()
                     if hasattr(a, "block_until_ready") else a, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
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

    # dispatch #1: OCR det + device CC
    jocr = p._jax_ocr
    t, cc_out = _bench(
        lambda: jocr._det_cc_full(jocr.det_params, padded, hw),
        rounds=args.rounds)
    results["cc_dispatch"] = t
    r_, pads_ = jocr.dispatch_det(padded, hw, hw_host=(ctx["uh"], ctx["uw"]))[1:]

    # det alone (as in the fused graph: with_stats, no pallas restriction)
    det = p.detector
    det_fn = jax.jit(lambda v, im, hw_: det.detect_graph(
        v, im, hw_, jnp.float32(cfg.detector.box_threshold),
        jnp.float32(cfg.detector.nms_iou_threshold), with_stats=True))
    t, det_out = _bench(det_fn, p.detector_params, padded, hw,
                        rounds=args.rounds)
    results["det"] = t

    # candidates from CC (device) — tiny, but measure to close the ledger
    from omniparser_tpu.ops.components import candidate_boxes_from_cc

    cand_fn = jax.jit(lambda b, c: candidate_boxes_from_cc(
        b, c, jnp.float32(r_), jnp.asarray(pads_, jnp.float32), hw,
        max_boxes=cfg.ocr.max_text_boxes))
    t, cand = _bench(cand_fn, cc_out["boxes"], cc_out["count"],
                     rounds=args.rounds)
    results["cc_candidates"] = t
    ocr_boxes, ocr_valid, _ = cand
    n_cand = int(jax.device_get(ocr_valid).sum())

    # rec: one block and the real block count
    from omniparser_tpu.models.ocr import ctc_device_stats
    from omniparser_tpu.ops.preprocess import crop_lines_batch

    rec = jocr.rec
    rec_hw = (cfg.ocr.rec_height, cfg.ocr.rec_max_width)
    blk = cfg.ocr.rec_block

    def rec_block(v, im, hw_, boxes):
        crops = crop_lines_batch(im, hw_, boxes, rec_hw)
        return ctc_device_stats(rec.apply(v, jocr.rec_preprocess(crops),
                                          train=False))

    rec_fn = jax.jit(rec_block)
    t, _ = _bench(rec_fn, jocr.rec_params, padded, hw, ocr_boxes[:blk],
                  rounds=args.rounds)
    results[f"rec_1block[{blk}]"] = t
    n_blocks = max(-(-n_cand // blk), 1)
    results["rec_blocks_needed"] = n_blocks
    results["rec_extrapolated"] = t * n_blocks

    # crop-gather for captions
    from omniparser_tpu.ops.preprocess import crop_resize_batch

    K = cfg.captioner.batch_size
    cap_boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.2, 0.2]], jnp.float32),
                         (K, 1))
    crop_fn = jax.jit(lambda im, hw_, b: crop_resize_batch(
        im, hw_, b, cfg.captioner.crop_size))
    t, _ = _bench(crop_fn, padded, hw, cap_boxes, rounds=args.rounds)
    results[f"cap_crop[{K}]"] = t

    # merge + compaction
    from omniparser_tpu.ops.overlap import merge_icons_and_ocr

    det_boxes, det_scores, det_valid = det_out[:3]
    merge_fn = jax.jit(lambda db, dv, ob, ov: merge_icons_and_ocr(
        db, dv, ob, ov, jnp.float32(cfg.iou_threshold)))
    t, _ = _bench(merge_fn, det_boxes, det_valid, ocr_boxes, ocr_valid,
                  rounds=args.rounds)
    results["merge"] = t

    # the production fused step (reference point)
    fut = jocr.dispatch_det(padded, hw, hw_host=(ctx["uh"], ctx["uw"]))
    cc, r2, pads2 = fut

    def fused_call():
        return p.fused(
            p.detector_params, jocr.rec_params,
            p.fused.captioner.params if p.fused.captioner else 0,
            padded, hw, true_hw, cc["boxes"], cc["count"],
            cfg.detector.box_threshold, cfg.detector.nms_iou_threshold,
            cfg.iou_threshold, cfg.ocr.text_threshold,
            lb_r=r2, lb_pads=pads2)

    t, _ = _bench(fused_call, rounds=args.rounds)
    results["fused_step"] = t

    results["image"] = img_path
    results["n_ocr_candidates"] = n_cand
    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
