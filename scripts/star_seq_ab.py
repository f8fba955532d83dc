"""Star-variant seq-len A/B on TPU: L=31 (relay makes 32 rows, lane-aligned)
vs L=32 (relay makes 33 rows).

The round-4 L=32 adoption (RESULTS.md "Sequence-pad layout A/B") measured the
transformer variant only. The star codec appends a relay row to the satellite
ring, so its aligned length is L_such_that L+1 % 32 == 0 — i.e. the reference's
L=31 was already the aligned length FOR STAR. This script measures both, both
kernel modes, and prints one JSON line.

Usage: python scripts/star_seq_ab.py [--steps 20] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def measure(seq_len: int, mode: str, batch_size: int, scan_k: int,
            steps: int, reps: int, warmup: int) -> float:
    from deepsc_gan_tpu.data.loader import synthetic_dataset
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.ops.pallas.star import set_star_kernel_mode
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_train_multi_step,
    )
    from deepsc_gan_tpu.utils.config import Config

    set_star_kernel_mode(mode)
    try:
        cfg = Config(bs=batch_size, dtype="bfloat16", seq_len=seq_len)
        model = make_model(cfg, "star")
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, cfg, key)
        mstep = make_train_multi_step(model, cfg, donate=False,
                                      full_target=True)
        ds = synthetic_dataset(n=batch_size * scan_k, seq_len=cfg.seq_len,
                               vocab_size=cfg.vocab_size,
                               batch_size=batch_size, seed=0)
        batch = jnp.asarray(np.stack([b for b, _ in ds], axis=0))
        for _ in range(max(1, warmup)):
            key, sub = jax.random.split(key)
            state, losses = mstep(state, batch, batch, sub, 0.1)
        float(losses.sum())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(steps):
                key, sub = jax.random.split(key)
                state, losses = mstep(state, batch, batch, sub, 0.1)
            float(losses.sum())
            best = min(best, time.perf_counter() - t0)
        return steps * scan_k * batch_size / best
    finally:
        set_star_kernel_mode("auto")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--scan-k", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    out = {"backend": jax.default_backend(), "bs": args.bs,
           "scan_k": args.scan_k}
    for mode in ("pallas", "xla"):
        for L in (31, 32):
            key = f"{mode}_L{L}"
            out[key] = round(measure(L, mode, args.bs, args.scan_k,
                                     args.steps, args.reps, args.warmup), 1)
            print(f"# {key}: {out[key]:.0f} sents/s", file=sys.stderr)
    out["pallas_L31_over_L32"] = round(out["pallas_L31"] / out["pallas_L32"],
                                       4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
