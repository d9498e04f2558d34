"""End-to-end parse benchmark (run by the driver on real TPU hardware).

Metric: screenshots/sec/chip for the full parse pipeline — letterbox +
YOLOv8-n detect + on-device NMS + JAX OCR (det+rec) + overlap merge +
Florence-2-base caption decode + SOM overlay + PNG encode — on the
reference's demo screenshots.  The detector and OCR run the shipped
synthetic-GUI-trained checkpoints ('auto' defaults); the captioner is
PINNED to Florence-2-base dims with random init so the measured compute
class matches the reference's fine-tuned Florence-2-base (the shipped
functional cap_synth captioner is a reduced-dims model — benching it
would inflate throughput against the A100 reference point; its quality
is gated in tests/test_e2e_quality.py instead).

Baselines:
  * vs_baseline uses 1/0.6 = 1.667 screenshots/sec as the A100 reference
    point.  SOFT NUMBER: the reference publishes no in-repo throughput
    (SURVEY.md §6); 0.6 s/frame comes from the public OmniParser V2 blog
    figure.  It could not be measured locally (ultralytics/easyocr are not
    installed here).
  * mfu is self-contained and assumption-free: XLA cost-analysis FLOPs of
    the compiled device graphs / (p50 wall x chip peak).  On a tunneled
    TPU wall-clock is dominated by transfer weather (PERF.md); mfu and
    device_time_share say how fast the device path itself is.

Prints exactly ONE JSON line on stdout.
"""

import dataclasses
import json
import os
import time

import numpy as np

BASELINE_SHOTS_PER_SEC = 1.0 / 0.6  # A100 V2 reference point (see docstring)

# bf16 peak FLOPs/s per chip by device kind (jax.devices()[0].device_kind)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}


def main():
    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.utils.cache import enable_compilation_cache
    from omniparser_tpu.utils.image import load_image_rgb

    enable_compilation_cache()  # repeat runs warm-start the 2-4 min compile

    names = ["demo_image.jpg", "google_page.png", "windows.png", "mobile.png",
             "ios.png", "word.png", "excel.png", "onenote.png"]
    imgs = [
        load_image_rgb(f"/root/reference/imgs/{n}")
        for n in names
        if os.path.exists(f"/root/reference/imgs/{n}")
    ]

    # Serving configuration: max_upload_side=1920 caps the host->device
    # transfer (the dominant cost on this tunneled TPU; bandwidth swings
    # 85-220 MB/s) AND makes the upload copy double as the SOM canvas
    # (max_som_side equal => the overlay stage skips its cv2.resize — the
    # host resize was ~50 ms/frame at 4K on the 1-core host).  Detection
    # runs at <=1280px regardless; element counts on the reference images
    # match the full-res path to within 1-2.
    base = PipelineConfig()
    cfg = dataclasses.replace(
        base, max_upload_side=1920, max_som_side=1920,
        # int8 weight-only caption decode (models/quant.py): greedy
        # captions exact-match the fp path (tests/test_quant.py gate);
        # the decode is weight-traffic-bound so int8 cuts its device time
        # ~26% (PERF.md).  split_decode (CaptionerConfig default) decodes
        # only the needed slot bucket in a second dispatch.
        captioner=dataclasses.replace(base.captioner, quant="int8"),
    )
    ocr_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "omniparser_tpu", "weights", "ocr_en_synth",
    )
    if os.path.isdir(ocr_ckpt):
        cfg = dataclasses.replace(cfg, ocr_weights=ocr_ckpt)
    # Florence-2-base-class captioner compute (see docstring)
    cfg = dataclasses.replace(cfg, captioner_weights=None)
    pipeline = SOMPipeline(cfg)
    pipeline.parse_batch(imgs)  # warmup: compile every bucket's graphs

    # single-screenshot latency (serving p50); per-stage timings are the
    # per-stage MEDIANS over the loop — a single tunnel stall otherwise
    # misattributes seconds to whatever stage it hit (weather, PERF.md)
    lat, stage_runs = [], []
    for _ in range(8):
        t = time.perf_counter()
        pipeline.parse_image(imgs[0])
        lat.append(time.perf_counter() - t)
        stage_runs.append(dict(pipeline.last_timings))
    p50 = float(np.median(lat))
    stage_med = {
        k: float(np.median([r.get(k, 0.0) for r in stage_runs]))
        for k in stage_runs[0]
    }

    # pipelined batched throughput (the serving configuration; BASELINE
    # config 4 "multi-screenshot batched parse").  Median over >=5 rounds
    # damps (not eliminates) tunnel-bandwidth variance; when the first 5
    # fit the budget, extra rounds (up to 9 / ~75 s total) tighten the
    # median against single-round weather stalls.
    round_times = []
    t_bench = time.perf_counter()
    for i in range(9):
        if i >= 5 and time.perf_counter() - t_bench > 75.0:
            break
        t0 = time.perf_counter()
        pipeline.parse_batch(imgs)
        round_times.append(time.perf_counter() - t0)
    shots_per_sec = len(imgs) / float(np.median(round_times))
    # best round: distinguishes tunnel weather from code regressions when
    # comparing across runs (the median is the headline number)
    best_shots_per_sec = len(imgs) / float(np.min(round_times))

    # MFU: XLA cost-model FLOPs of the device graphs for the p50 image
    import jax

    flops = pipeline.flops_per_parse(imgs[0])
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 100e12)
    mfu = flops["total"] / (p50 * peak) if flops["total"] else 0.0
    timings = stage_med
    # device time = fused step + the OCR det+components dispatch (both are
    # device work).  With fused candidates (OcrConfig.fused_candidates,
    # default) the det dispatch chains into the fused step with no host
    # sync, so its time is already inside the device_step timer; in the
    # host-candidate mode it must be measured alone (the ocr_detect stage
    # timer also contains the upload drain).
    det_ms = []
    if pipeline._jax_ocr is not None:
        ctx = pipeline._stage_upload(imgs[0])
        jax.block_until_ready(ctx["padded_dev"])
        for _ in range(5):
            t = time.perf_counter()
            fut, _r, _p = pipeline._jax_ocr.dispatch_det(
                ctx["padded_dev"], ctx["orig_hw"], hw_host=(ctx["uh"], ctx["uw"]))
            jax.block_until_ready(fut)
            det_ms.append(time.perf_counter() - t)
    det_step = float(np.median(det_ms)) if det_ms else 0.0
    det_in_fused = getattr(pipeline, "_fused_ocr", False)
    device_share = (
        timings.get("device_step", 0.0) + timings.get("decode", 0.0)
        + (0.0 if det_in_fused else det_step)
    ) / max(sum(timings.values()), 1e-9)

    print(
        json.dumps(
            {
                "metric": "screenshots/sec/chip end-to-end parse",
                "value": round(shots_per_sec, 4),
                "unit": "screenshots/sec",
                "vs_baseline": round(shots_per_sec / BASELINE_SHOTS_PER_SEC, 4),
                "best_round_shots_per_sec": round(best_shots_per_sec, 4),
                "baseline_note": "assumed 0.6 s/frame A100 (public V2 figure); "
                                 "not measurable in-image — see PERF.md",
                "p50_latency_s": round(p50, 4),
                "mfu": round(mfu, 6),
                "device_flops_per_parse": flops["total"],
                "device_flops_split": {k: v for k, v in flops.items() if k != "total"},
                "device_time_share": round(device_share, 4),
                "captioner_quant": cfg.captioner.quant,
                "ocr_det_step_s": round(det_step, 4),
                "ocr_weights": bool(cfg.ocr_weights),
                "stage_timings_s": {k: round(v, 4) for k, v in timings.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
