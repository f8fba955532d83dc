"""Capture a jax.profiler trace of the scaled train step and print the
top device ops by total time (VERDICT r2 items 1 and 9: find where the
compute-bound step's time actually goes, op-level star timings).

Parses the perfetto trace.json.gz the profiler writes — no tensorboard
needed. Usage:
  python scripts/profile_breakdown.py --d 256 --batch 512
  python scripts/profile_breakdown.py --variant star --d 128 --batch 64
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def build_step(args):
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_train_multi_step,
    )
    from deepsc_gan_tpu.utils.config import Config

    d = args.d
    cfg = Config(bs=args.batch, dtype="bfloat16",
                 encoder_d_model=d, decoder_d_model=d,
                 encoder_d_ff=4 * d, decoder_d_ff=4 * d,
                 encoder_num_layer=args.layers,
                 decoder_num_layer=args.layers)
    if args.variant == "star":
        cfg = Config(bs=args.batch, dtype="bfloat16")
    model = make_model(cfg, args.variant)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    mstep = make_train_multi_step(model, cfg, donate=False,
                                  full_target=args.variant == "star")
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        0, cfg.vocab_size, size=(args.scan_k, cfg.bs, cfg.seq_len)),
        dtype=jnp.int32)
    return mstep, state, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--scan-k", type=int, default=8)
    ap.add_argument("--variant", default="transformer")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None,
                    help="also dump the aggregate table to this json")
    args = ap.parse_args()

    mstep, state, batch = build_step(args)
    key = jax.random.PRNGKey(1)
    for _ in range(2):  # compile + steady-state warmup
        key, sub = jax.random.split(key)
        state, losses = mstep(state, batch, batch, sub, 0.1)
    float(losses.sum())

    tmp = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tmp):
        key, sub = jax.random.split(key)
        state, losses = mstep(state, batch, batch, sub, 0.1)
        float(losses.sum())

    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no trace under {tmp}")
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # device lanes only (drop host threads): pids whose process_name
    # mentions TPU/device
    proc = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in proc.items()
                if re.search(r"TPU|/device|Device", name, re.I)}

    agg = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        agg[name] += dur
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"device total {total / 1e3:.2f} ms over 1 dispatch "
          f"({args.scan_k} steps); top ops:")
    table = []
    for name, dur in rows:
        pct = 100.0 * dur / max(total, 1e-9)
        print(f"  {dur / 1e3:8.3f} ms  {pct:5.1f}%  {name[:100]}")
        table.append({"name": name, "ms": round(dur / 1e3, 3),
                      "pct": round(pct, 2)})

    # category roll-up: XLA op names are `<family>.<serial>` (copy.12,
    # fusion.6444, transpose_jvp___.21) — stripping the serial groups the
    # trace into families, which is what quantifies the "data formatting"
    # (copy/transpose/bitcast/reshape) bucket vs compute (fusion/conv/dot)
    cats = defaultdict(float)
    for name, dur in agg.items():
        fam = re.sub(r"[.\d]+$", "", name) or name
        cats[fam] += dur
    cat_rows = sorted(cats.items(), key=lambda kv: -kv[1])
    fmt_ms = sum(d for n, d in cats.items()
                 if re.search(r"copy|transpose|bitcast|reshape|convert",
                              n, re.I))
    print("by family:")
    cat_table = []
    for name, dur in cat_rows[: args.top]:
        pct = 100.0 * dur / max(total, 1e-9)
        print(f"  {dur / 1e3:8.3f} ms  {pct:5.1f}%  {name[:80]}")
        cat_table.append({"family": name, "ms": round(dur / 1e3, 3),
                          "pct": round(pct, 2)})
    print(f"data-formatting families (copy/transpose/bitcast/reshape/"
          f"convert): {fmt_ms / 1e3:.3f} ms "
          f"({100.0 * fmt_ms / max(total, 1e-9):.1f}%)")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"config": vars(args), "total_ms": total / 1e3,
                       "top": table, "by_family": cat_table,
                       "data_formatting_ms": round(fmt_ms / 1e3, 3),
                       "data_formatting_pct": round(
                           100.0 * fmt_ms / max(total, 1e-9), 2)},
                      f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
