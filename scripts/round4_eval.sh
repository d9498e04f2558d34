#!/usr/bin/env bash
# Round-4 evaluation sweep (run on an IDLE host+TPU, after retraining):
#   1. real-pixels grounding bench (237 hand-annotated targets)
#   2. synthetic grounding bench at dataset scale (>=200 targets, CIs)
#   3. fused device_step stage decomposition
# Logs land in eval artifacts + /tmp for PERF/PARITY updates.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== real_bench"
python -m omniparser_tpu.eval.real_bench --log /tmp/real_bench_r4.jsonl

echo "== synth_bench (40 scenes)"
python -m omniparser_tpu.eval.synth_bench --scenes 40 --log /tmp/synth_bench_r4.jsonl

echo "== device_step profile"
python scripts/profile_device_step.py --rounds 5
