"""Produce the final reference-format result tables from a sweep-best
checkpoint (log/parity/<config>_best.pkl):

  1. 19-point greedy BLEU-1 AWGN curve  -> log/test-DeepSC-ours.pkl
     (the reference's test-DeepSC.pkl protocol, utlis/eval.py:78-117)
  2. teacher-forced FGM table           -> log/eval-transformer-ours.pkl
     (the reference's eval.pkl protocol, utlis/eval.py:189-232; rows
     [snr, bleu_clean, bleu_attacked, loss_clean, loss_attacked])
  3. both metrics variant (--metric both) adds similarity columns.

Run ONE process at a time on the TPU.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import (
    save_result_table,
    snr_sweep_bleu_fast,
    teacher_forced_sweep,
)
from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import create_train_state, make_eval_step
from deepsc_gan_tpu.utils.config import Config
from scripts.parity_sweep import (
    GRID,
    REF_DATA,
    REF_VOCAB,
    held_out_batches,
    split_data,
)

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_CURVE = {  # test-DeepSC.pkl (BASELINE.md)
    0: 0.576, 3: 0.835, 6: 0.876, 9: 0.898, 12: 0.920, 15: 0.928, 18: 0.933}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--best-pkl", default="log/parity/final_rand_cos_best.pkl")
    ap.add_argument("--config", default="final_rand_cos")
    ap.add_argument("--out-dir", default="log")
    ap.add_argument("--metric", default="bleu")
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--epsilon", type=float, default=1.0)
    args = ap.parse_args()

    with open(args.best_pkl, "rb") as f:
        blob = pickle.load(f)
    overrides = blob.get("overrides", GRID.get(args.config, {}))
    # saved best-params blobs were trained at the reference's L=31
    # (before the framework default moved to 32); honor a blob override
    # if present, else pin 31
    overrides.setdefault("seq_len", 31)
    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2, **overrides)
    print(f"[final] config={args.config} best_epoch={blob.get('epoch')} "
          f"sweep_mean={blob.get('mean_bleu'):.4f}")

    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state = state.replace(params=jax.tree.map(lambda x: x, blob["params"]))

    _, held = split_data(REF_DATA, seed=0)
    vocab = Vocab.load(REF_VOCAB)
    batches = held_out_batches(held, cfg)
    snrs = list(range(0, 19))

    sweep_fn = make_greedy_decode_sweep(model, cfg)
    table = snr_sweep_bleu_fast(sweep_fn, state.params, batches, vocab, cfg,
                                snrs=snrs, key=jax.random.PRNGKey(999),
                                metric=args.metric)
    save_result_table(table, os.path.join(args.out_dir,
                                          "test-DeepSC-ours.pkl"))
    print("greedy AWGN curve (ours vs reference):")
    for row in table:
        snr = int(row[0])
        ref = REFERENCE_CURVE.get(snr)
        delta = f" ({row[1] - ref:+.3f})" if ref else ""
        print(f"  SNR={snr:2d}dB BLEU-1={row[1]:.4f}"
              + (f" ref={ref:.3f}{delta}" if ref else ""))

    step = make_eval_step(model, cfg)
    tf_table = teacher_forced_sweep(step, state, batches, vocab, cfg,
                                    snrs=snrs, pnr_db=args.pnr_db,
                                    epsilon=args.epsilon,
                                    key=jax.random.PRNGKey(99),
                                    metric=args.metric)
    save_result_table(tf_table, os.path.join(args.out_dir,
                                             "eval-transformer-ours.pkl"))
    print("teacher-forced FGM table:")
    for r in tf_table:
        print(f"  SNR={r[0]:2.0f}dB clean={r[1]:.4f} attacked={r[2]:.4f} "
              f"loss={r[-2]:.3f}/{r[-1]:.3f}")


if __name__ == "__main__":
    main()
