"""Weak-scaling throughput harness for the dp-sharded serving parse.

Measures `parallel.sharded_parse.ShardedParse` end-to-end shots/s at
dp = 1, 2, 4, 8 ... with a FIXED per-device batch (weak scaling: ideal is
shots/s growing linearly with dp) and reports scaling efficiency.  This is
the multi-chip analogue of bench.py's single-chip number — the reference
has no distributed serving at all (SURVEY.md §2.7: its only concurrency is
per-request FastAPI handlers), so there is no reference figure to match;
the contract here is that OUR batched graph partitions over the mesh and
throughput scales.

Where the numbers mean what:

* Real multi-chip TPU (co-located host): the honest configuration — run
  with `--trained` for shipped checkpoints at serving resolution.
* Virtual CPU mesh (this dev image / CI): validates that the sharded
  graphs partition, execute, and that per-device work stays constant as dp
  grows.  On a MULTI-core host the dp scaling is real (XLA's CPU client
  backs each virtual device with its own threads); on a 1-core host all
  virtual devices time-slice one core, so expect FLAT shots/s with
  near-constant per-shot device time — that flatness is reported, not
  hidden (the "no silent caps" rule).

Output: one JSON line per dp point plus a summary line, and optionally
`--out MESH_SCALING.json` with the full record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bootstrap(max_dp: int):
    import jax
    from jax._src import xla_bridge

    if not xla_bridge.backends_are_initialized():
        # Decide up front: a tunneled single TPU cannot host a mesh — use
        # the virtual CPU client for the scaling shape instead.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max_dp)
    import jax  # noqa: F811

    if len(jax.devices()) < max_dp:
        raise SystemExit(
            f"{len(jax.devices())} devices < requested max dp {max_dp}"
        )
    return jax


def _tiny_pipeline():
    """Tiny random-init models: fast compiles, same graph structure as the
    shipped config (detector + JAX OCR rec slots + fused caption crops)."""
    from omniparser_tpu.config import (
        CaptionerConfig,
        DetectorConfig,
        OcrConfig,
        PipelineConfig,
    )
    from omniparser_tpu.models.florence2 import FlorenceCaptioner, FlorenceDims
    from omniparser_tpu.pipeline import SOMPipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=128, max_detections=16,
                                prefilter_topk=512),
        captioner=CaptionerConfig(batch_size=8, crop_size=32, max_new_tokens=4),
        ocr=OcrConfig(backend="null"),
        detector_weights=None,
    )
    tiny = FlorenceDims(
        embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
        num_groups=(1, 2, 4, 8), depths=(1, 1, 1, 1), window_size=4,
        d_model=32, encoder_layers=2, decoder_layers=2, attn_heads=4,
        ffn_dim=64, vocab_size=100, max_positions=64,
    )
    return SOMPipeline(cfg, captioner=FlorenceCaptioner(cfg.captioner, dims=tiny))


def _trained_pipeline():
    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.pipeline import SOMPipeline

    return SOMPipeline(PipelineConfig())  # 'auto' defaults: shipped ckpts


def _images(n: int, hw) -> list:
    import numpy as np

    h, w = hw
    out = []
    for i in range(n):
        img = np.full((h, w, 3), 24 + 16 * (i % 8), np.uint8)
        img[h // 5: 3 * h // 5, w // 4: 3 * w // 4] = 255 - 8 * (i % 8)
        out.append(img)
    return out


def run(dp_list, per_device: int, rounds: int, trained: bool, hw) -> dict:
    jax = _bootstrap(max(dp_list))
    from omniparser_tpu.parallel.mesh import make_mesh
    from omniparser_tpu.parallel.sharded_parse import ShardedParse

    pipeline = _trained_pipeline() if trained else _tiny_pipeline()
    points = []
    base = None
    for dp in dp_list:
        mesh = make_mesh(jax.devices()[:dp], dp=dp, tp=1)
        sp = ShardedParse(pipeline, mesh)
        images = _images(dp * per_device, hw)
        sp.parse_images(images)  # compile + warm
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            res = sp.parse_images(images)
            times.append(time.perf_counter() - t0)
        assert len(res) == len(images)
        p50 = sorted(times)[len(times) // 2]
        sps = len(images) / p50
        eff = None
        if base is None:
            base = (dp, sps)
        else:
            eff = round(sps / (base[1] * dp / base[0]), 3)
        point = {"dp": dp, "images": len(images), "p50_s": round(p50, 4),
                 "shots_per_s": round(sps, 3), "weak_scaling_eff": eff}
        points.append(point)
        print(json.dumps(point), flush=True)

    summary = {
        "metric": "sharded_parse_weak_scaling",
        "backend": jax.devices()[0].platform,
        "host_cpus": os.cpu_count(),
        "per_device_batch": per_device,
        "trained_ckpts": trained,
        "image_hw": list(hw),
        "points": points,
        "note": ("virtual CPU devices on a 1-core host time-slice one core: "
                 "flat shots/s there is expected; real scaling needs a "
                 "multi-core host or a real multi-chip mesh"
                 if jax.devices()[0].platform == "cpu" and os.cpu_count() == 1
                 else "weak scaling: ideal shots/s = dp * dp1_shots/s"),
    }
    print(json.dumps(summary), flush=True)
    return summary


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dp-list", default="1,2,4,8",
                    help="comma-separated dp points (default 1,2,4,8)")
    ap.add_argument("--per-device", type=int, default=1,
                    help="images per device per round (weak scaling)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--trained", action="store_true",
                    help="shipped checkpoints at serving size (slow compile; "
                    "use on real hardware) instead of tiny random-init")
    ap.add_argument("--hw", default=None,
                    help="HxW of synthetic screenshots (default 96x112 tiny, "
                    "540x960 trained)")
    ap.add_argument("--out", default=None, help="write summary JSON here")
    args = ap.parse_args(argv)

    dp_list = [int(x) for x in args.dp_list.split(",") if x]
    hw = (tuple(int(x) for x in args.hw.split("x"))
          if args.hw else ((540, 960) if args.trained else (96, 112)))
    summary = run(dp_list, args.per_device, args.rounds, args.trained, hw)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
