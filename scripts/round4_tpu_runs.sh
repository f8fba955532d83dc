#!/bin/bash
# Round-4 TPU measurement queue — run when the axon tunnel is back.
# ONE TPU process at a time (tpu-bench-discipline); each step syncs via
# value readback inside the python entrypoints.
set -x
cd "$(dirname "$0")/.."

# 1. VERDICT r3 item 3: L=31 vs L=32 layout A/B (flagship + d256 shapes)
timeout 2400 python bench.py --seq-ab --seq-ab-d256 \
    | tee results/seq_ab_r4.json

# 2. VERDICT r3 item 4 follow-through: retrain the headline star run WITH
#    params saved, emitting BOTH protocol curves on the same params
#    (previous headline params were never saved).
timeout 10800 python scripts/star_quality.py \
    --out results/test-star-ours.pkl \
    --save-params results/star_best_params.pkl 2>&1 \
    | tee /tmp/star_quality_r4.log

# 3. Canonical round-4 perf snapshot (same axes as round 3)
timeout 3600 python bench.py --decode --star --scaling --ce-ab \
    --model-scale | tee results/bench_r4_snapshot.json
