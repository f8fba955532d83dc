"""Remaining measured protocol tables from the saved plain best params
(results/plain_best_params.pkl, written by scripts/gan_tables.py):

  1. PGD-bisection teacher-forced table (reference `eval_step_normal_pgd`,
     utlis/eval.py:235-318: FGM direction + 10-iteration bisection on the
     attack strength) -> results/eval-pgd-ours.pkl, rows
     [snr, bleu_clean, bleu_attacked, loss_clean, loss_attacked];
  2. Two-metric greedy sweep (--metric both: BLEU-1 + sentence
     similarity, reference utlis/tools.py:30-103 scores them side by
     side) -> results/test-DeepSC-ours-both.pkl, rows
     [snr, bleu, similarity];
  3. BLEU-1..4 greedy curves (BASELINE.md names BLEU-1-4 parity; the
     reference's BleuScore takes per-n-gram weights, tools.py:30-43)
     -> results/test-DeepSC-ours-bleu{n}.pkl for n in 1..4.

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
    snr_sweep_bleu_fast,
    teacher_forced_sweep,
)
from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import (
    create_train_state,
    make_eval_step_pgd,
)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plain-params", default="results/plain_best_params.pkl")
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--epsilon", type=float, default=1.0)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--eval-batches", type=int, default=0)
    ap.add_argument("--snr-stride", type=int, default=1)
    ap.add_argument("--beam", type=int, default=0,
                    help="also run a beam-N sweep -> "
                         "test-DeepSC-ours-beam.pkl (0 = skip)")
    ap.add_argument("--skip-base", action="store_true",
                    help="skip the PGD/both/bleu1-4 sections (beam only)")
    args = ap.parse_args()

    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2, **LEVERS)
    _, held = split_data(REF_DATA, seed=0)
    vocab = Vocab.load(REF_VOCAB)
    batches = held_out_batches(held, cfg, limit=args.eval_batches)
    snrs = list(range(0, 19, args.snr_stride))

    with open(args.plain_params, "rb") as f:
        plain = pickle.load(f)["params"]
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state = state.replace(params=jax.tree.map(jnp.asarray, plain))

    if args.beam:
        from deepsc_gan_tpu.evaluate.beam import make_beam_decode
        from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu

        decode = make_beam_decode(model, cfg, beam_size=args.beam)
        t = snr_sweep_bleu(decode, state.params, batches, vocab, cfg,
                           snrs=snrs, key=jax.random.PRNGKey(999))
        save_result_table(t, os.path.join(args.out_dir,
                                          "test-DeepSC-ours-beam.pkl"))
        print(f"BEAM-{args.beam}: " + " ".join(f"{b:.3f}" for _, b in t),
              flush=True)
    if args.skip_base:
        return

    pgd_step = make_eval_step_pgd(model, cfg)
    table = teacher_forced_sweep(pgd_step, state, batches, vocab, cfg,
                                 snrs=snrs, pnr_db=args.pnr_db,
                                 epsilon=args.epsilon,
                                 key=jax.random.PRNGKey(99))
    save_result_table(table, os.path.join(args.out_dir, "eval-pgd-ours.pkl"))
    for r in table:
        print(f"PGD SNR={r[0]:2.0f} clean={r[1]:.4f} att={r[2]:.4f}",
              flush=True)

    sweep_fn = make_greedy_decode_sweep(model, cfg)
    both = snr_sweep_bleu_fast(sweep_fn, state.params, batches, vocab, cfg,
                               snrs=snrs, key=jax.random.PRNGKey(999),
                               metric="both")
    save_result_table(both, os.path.join(args.out_dir,
                                         "test-DeepSC-ours-both.pkl"))
    for snr, *ms in both:
        print(f"BOTH SNR={snr:2.0f} " +
              " ".join(f"{m:.4f}" for m in ms), flush=True)

    for n in range(1, 5):
        weights = tuple(1.0 if i == n - 1 else 0.0 for i in range(4))
        t = snr_sweep_bleu_fast(sweep_fn, state.params, batches, vocab,
                                cfg, snrs=snrs, key=jax.random.PRNGKey(999),
                                bleu_weights=weights)
        save_result_table(t, os.path.join(
            args.out_dir, f"test-DeepSC-ours-bleu{n}.pkl"))
        print(f"BLEU-{n}: " + " ".join(f"{b:.3f}" for _, b in t),
              flush=True)


if __name__ == "__main__":
    main()
