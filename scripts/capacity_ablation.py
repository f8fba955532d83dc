"""Model-capacity ablation at fixed (10%) data: does a bigger-than-
reference codec buy more held-out BLEU, or is the 6.6k-sentence corpus
the binding constraint? Trains the headline recipe at the reference
scale (d_model=128, dff=512, 4+4 layers) and scaled-up variants, same
budget, and writes per-config curves to results/capacity_ablation.json.

Run ONE process at a time on the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu_fast
from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
from deepsc_gan_tpu.utils.config import Config
from scripts.parity_sweep import (
    REF_DATA,
    REF_VOCAB,
    held_out_batches,
    split_data,
)
from scripts.robust_tables import LEVERS, plain_train

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

CONFIGS = {
    "ref_scale": dict(),  # d_model=128, dff=512, 4+4, 8 heads
    "d256": dict(encoder_d_model=256, decoder_d_model=256,
                 encoder_d_ff=1024, decoder_d_ff=1024),
    "deep6": dict(encoder_num_layer=6, decoder_num_layer=6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="ref_scale,d256,deep6")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/capacity_ablation.json")
    ap.add_argument("--eval-batches", type=int, default=0)
    args = ap.parse_args()

    train_raw, held = split_data(REF_DATA, seed=0)
    vocab = Vocab.load(REF_VOCAB)
    snrs = [0, 3, 6, 9, 12, 15, 18]

    out = {}
    for name in args.configs.split(","):
        cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2,
                     **LEVERS, **CONFIGS[name])
        held_batches = held_out_batches(held, cfg,
                                        limit=args.eval_batches)
        print(f"=== {name}", flush=True)
        model, state = plain_train(cfg, train_raw, held_batches, vocab,
                                   args.epochs, args.k, args.seed,
                                   eval_every=args.eval_every)
        sweep_fn = make_greedy_decode_sweep(model, cfg)
        table = snr_sweep_bleu_fast(sweep_fn, state.params, held_batches,
                                    vocab, cfg, snrs=snrs,
                                    key=jax.random.PRNGKey(999))
        n_params = sum(int(x.size) for x in jax.tree.leaves(state.params))
        mean = sum(r[1] for r in table) / len(table)
        out[name] = {"params": n_params, "mean_bleu1": round(mean, 4),
                     "curve": [[r[0], round(r[1], 4)] for r in table]}
        print(f"{name}: params={n_params:,} mean={mean:.4f} "
              f"{[round(r[1], 3) for r in table]}", flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
