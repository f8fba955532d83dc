"""Benchmark: training throughput of the flagship model at reference scale.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: teacher-forced training throughput in sentences/sec/chip for the
vanilla DeepSC transceiver at the reference's published scale
(d_model=128, 4+4 layers, 8 heads, dff=512, vocab=22,234, L=31, B=64 —
DeepSC-GAN/utlis/parameters.py:20-54), AWGN channel, Adam — i.e. the
reference's `train_step_noattack` workload.

vs_baseline: ratio against REFERENCE_SENTS_PER_SEC, an estimate of the
TF2 reference's single-GPU throughput (its hardware is unstated —
SURVEY.md §6). Estimate: the reference runs unfused TF2 eager-traced
Keras at batch 64; a ~7M-param model of this shape steps in ~25ms on a
V100-class card => ~2,500 sentences/sec. BASELINE.md's target is >=5x
this per chip.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the TPU may compile remotely (30-300s for the
# scan program); repeat bench runs should hit the cache
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_SENTS_PER_SEC = 2500.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=4,
                        help="multi-step dispatches per rep")
    parser.add_argument("--scan-steps", type=int, default=16,
                        help="train steps fused per dispatch (lax.scan K)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    from deepsc_gan_tpu.data.loader import synthetic_dataset
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_train_multi_step,
    )
    from deepsc_gan_tpu.utils.config import Config

    cfg = Config(bs=args.batch, dtype=args.dtype)
    model = make_model(cfg, "transformer")
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key)
    # the framework's fast path: K train steps per dispatch via lax.scan
    # (bit-identical sequential Adam semantics; amortizes host->device
    # dispatch, which dominates at this model scale)
    K = args.scan_steps
    mstep = make_train_multi_step(model, cfg)

    ds = synthetic_dataset(n=args.batch * K, seq_len=cfg.seq_len,
                           vocab_size=cfg.vocab_size,
                           batch_size=args.batch, seed=0)
    batch = jnp.asarray(
        np.stack([b for b, _ in ds], axis=0))  # (K, B, L)

    for _ in range(args.warmup):
        key, sub = jax.random.split(key)
        state, losses = mstep(state, batch, batch, sub, 0.1)
    float(losses.sum())  # true sync (device->host readback)

    # best-of-N repetitions: the TPU may sit behind a shared tunnel whose
    # load varies; the least-contended rep is closest to hardware truth
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            state, losses = mstep(state, batch, batch, sub, 0.1)
        float(losses.sum())
        best = min(best, time.perf_counter() - t0)

    sents_per_sec = args.steps * K * args.batch / best
    n_chips = max(jax.device_count(), 1)
    per_chip = sents_per_sec / n_chips

    print(json.dumps({
        "metric": "train_throughput_flagship",
        "value": round(per_chip, 1),
        "unit": "sentences/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_SENTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
