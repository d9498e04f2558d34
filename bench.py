"""End-to-end parse benchmark (run by the driver on real TPU hardware).

Metric: screenshots/sec/chip for the full parse pipeline — letterbox +
YOLOv8-n detect + on-device NMS + JAX OCR (det+rec) + overlap merge +
Florence-2-base caption decode + SOM overlay + PNG encode — on the
reference's demo screenshot (random-init weights: compute is identical to
the weighted model; only the *values* differ).

Baseline: the reference publishes no in-repo throughput number (SURVEY.md
§6); the published OmniParser V2 figure is ~0.6 s/frame on A100
(https://huggingface.co/blog + README.md:20 claims "60% faster than V1").
vs_baseline therefore uses 1/0.6 = 1.667 screenshots/sec as the A100
reference point — documented assumption, revisit when real weights land.

Prints exactly ONE JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

BASELINE_SHOTS_PER_SEC = 1.0 / 0.6  # A100 V2 reference point (see docstring)


def main():
    import os

    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.utils.image import load_image_rgb

    names = ["demo_image.jpg", "google_page.png", "windows_home.png", "mobile.png",
             "ios.png", "word.png", "excel.png", "onenote.png"]
    imgs = [
        load_image_rgb(f"/root/reference/imgs/{n}")
        for n in names
        if os.path.exists(f"/root/reference/imgs/{n}")
    ]

    # Serving configuration: max_upload_side=2048 caps the host->device
    # transfer (the dominant cost on this tunneled TPU; bandwidth swings
    # 85-220 MB/s).  Detection runs at <=1280px regardless; element counts
    # on the reference images match the full-res path to within 1-2.
    import dataclasses

    pipeline = SOMPipeline(dataclasses.replace(PipelineConfig(), max_upload_side=2048))
    pipeline.parse_batch(imgs)  # warmup: compile every bucket's graphs

    # single-screenshot latency (serving p50)
    lat = []
    for _ in range(8):
        t = time.perf_counter()
        pipeline.parse_image(imgs[0])
        lat.append(time.perf_counter() - t)
    p50 = float(np.median(lat))

    # pipelined batched throughput (the serving configuration; BASELINE
    # config 4 "multi-screenshot batched parse").  The TPU in this
    # environment sits behind a tunnel whose bandwidth fluctuates by >5x
    # minute to minute; report the median round so one congested transfer
    # window doesn't dominate the number.
    round_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        pipeline.parse_batch(imgs)
        round_times.append(time.perf_counter() - t0)
    shots_per_sec = len(imgs) / float(np.median(round_times))
    print(
        json.dumps(
            {
                "metric": "screenshots/sec/chip end-to-end parse",
                "value": round(shots_per_sec, 4),
                "unit": "screenshots/sec",
                "vs_baseline": round(shots_per_sec / BASELINE_SHOTS_PER_SEC, 4),
                "p50_latency_s": round(p50, 4),
                "stage_timings_s": {k: round(v, 4) for k, v in pipeline.last_timings.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
