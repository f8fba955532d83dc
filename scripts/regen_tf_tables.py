"""Regenerate the AWGN teacher-forced FGM tables from saved params after
the eval-step noise-realization fix (the AWGN attack gradient now comes
from the SAME noise pass as the clean forward, matching the reference's
single-tape semantics — eval.py:197-213). Greedy tables are unaffected.

Inputs : results/{plain_best,robust,gan}_params.pkl (from gan_tables.py /
         robust_tables.py runs)
Outputs: results/eval-{transformer,robust,gan}-ours.pkl

Run ONE process at a time on the TPU.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import (
    save_result_table,
    teacher_forced_sweep,
)
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.gan_steps import make_gan_eval_step
from deepsc_gan_tpu.train.steps import create_train_state, make_eval_step
from deepsc_gan_tpu.utils.config import Config
from scripts.parity_sweep import (
    REF_DATA,
    REF_VOCAB,
    held_out_batches,
    split_data,
)
from scripts.robust_tables import LEVERS

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

JOBS = [  # (params pickle, variant, output table)
    ("plain_best_params.pkl", "transformer", "eval-transformer-ours.pkl"),
    ("robust_params.pkl", "transformer", "eval-robust-ours.pkl"),
    ("gan_params.pkl", "gan", "eval-gan-ours.pkl"),
    ("star_robust_params.pkl", "star", "eval-star-robust-ours.pkl"),
    # written by star_quality.py --save-params (round 4+); skipped if the
    # headline star run hasn't been re-done on the TPU yet
    ("star_best_params.pkl", "star", "eval-star-best-ours.pkl"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="results")
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--epsilon", type=float, default=1.0)
    ap.add_argument("--eval-batches", type=int, default=0)
    ap.add_argument("--snr-stride", type=int, default=1)
    args = ap.parse_args()

    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2, **LEVERS)
    _, held = split_data(REF_DATA, seed=0)
    vocab = Vocab.load(REF_VOCAB)
    batches = held_out_batches(held, cfg, limit=args.eval_batches)
    snrs = list(range(0, 19, args.snr_stride))

    for pkl, variant, out in JOBS:
        path = os.path.join(args.dir, pkl)
        if not os.path.exists(path):
            print(f"skip {out}: {path} missing", flush=True)
            continue
        with open(path, "rb") as f:
            params = pickle.load(f)["params"]
        model = make_model(cfg, variant)
        init_kw = {"traingan": True} if variant == "gan" else {}
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   **init_kw)
        state = state.replace(params=jax.tree.map(jnp.asarray, params))
        step = (make_gan_eval_step(model, cfg) if variant == "gan"
                else make_eval_step(model, cfg,
                                    full_target=(variant == "star")))
        table = teacher_forced_sweep(step, state, batches, vocab, cfg,
                                     snrs=snrs, pnr_db=args.pnr_db,
                                     epsilon=args.epsilon,
                                     key=jax.random.PRNGKey(99))
        save_result_table(table, os.path.join(args.dir, out))
        print(f"{out}: " + " ".join(
            f"{r[0]:.0f}:{r[1]:.3f}/{r[2]:.3f}" for r in table
            if int(r[0]) % 3 == 0), flush=True)


if __name__ == "__main__":
    main()
