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
    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline
    from omniparser_tpu.utils.image import load_image_rgb

    img = load_image_rgb("/root/reference/imgs/demo_image.jpg")

    pipeline = SOMPipeline(PipelineConfig())
    # warmup: compile every device graph
    for _ in range(2):
        pipeline.parse_image(img)

    n = 10
    t0 = time.perf_counter()
    lat = []
    for _ in range(n):
        t = time.perf_counter()
        pipeline.parse_image(img)
        lat.append(time.perf_counter() - t)
    wall = time.perf_counter() - t0

    shots_per_sec = n / wall
    p50 = float(np.median(lat))
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
