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

    pipeline = SOMPipeline(PipelineConfig())
    pipeline.parse_batch(imgs)  # warmup: compile every bucket's graphs

    # single-screenshot latency (serving p50)
    lat = []
    for _ in range(6):
        t = time.perf_counter()
        pipeline.parse_image(imgs[0])
        lat.append(time.perf_counter() - t)
    p50 = float(np.median(lat))

    # pipelined batched throughput (the serving configuration; BASELINE
    # config 4 "multi-screenshot batched parse")
    rounds = 3
    t0 = time.perf_counter()
    for _ in range(rounds):
        pipeline.parse_batch(imgs)
    wall = time.perf_counter() - t0
    shots_per_sec = rounds * len(imgs) / wall
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
