#!/bin/bash
# Round-4 TPU queue, part 2: seq-pad-32 QUALITY validation (the
# throughput A/B in results/seq_ab_r4.json shows +9.9% at flagship —
# this pairs it with a same-seed same-budget held-out BLEU comparison,
# because the channel power-norm includes PAD positions so L=32 is not
# bit-identical to L=31 and adoption needs quality evidence, not just
# speed). Waits for the part-1 queue (star retrain + bench snapshot) to
# free the chip first — ONE TPU process at a time.
set -x
cd "$(dirname "$0")/.."

if [ -f /tmp/round4_tpu.pid ]; then
    while kill -0 "$(cat /tmp/round4_tpu.pid)" 2>/dev/null; do sleep 60; done
fi

timeout 2400 python scripts/parity_sweep.py \
    --configs final_rand_cos --epochs 600 --eval-every 50 --patience 99 \
    --seq-len 31 --log-dir log/seq_ab --tag seq31 2>&1 | tail -20

timeout 2400 python scripts/parity_sweep.py \
    --configs final_rand_cos --epochs 600 --eval-every 50 --patience 99 \
    --seq-len 32 --log-dir log/seq_ab --tag seq32 2>&1 | tail -20
