"""Teacher-forced FGM tables for a ROBUST (adversarially trained) model —
the reference's actual `eval.pkl` artifact comes from robust configs
(its attacked columns sit within ~3 pts of clean, e.g. 0.772 vs 0.804 at
0 dB), whereas results/eval-transformer-ours.pkl measures a plain model.

Protocol:
  1. plain training with the headline recipe (held-out keep-best);
  2. FGM-adversarial fine-tuning from the best plain params with the
     mixed objective (adv_weight, reference trainer.py:30-64 is w=1);
  3. teacher-forced FGM sweep (utlis/eval.py:189-232 protocol) ->
     results/eval-robust-ours.pkl, rows
     [snr, bleu_clean, bleu_attacked, loss_clean, loss_attacked];
  4. FGM-attacked greedy sweep (the reference test.pkl protocol) ->
     results/test-robust-ours.pkl.

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
import numpy as np

from deepsc_gan_tpu.data.augment import make_train_dataset
from deepsc_gan_tpu.data.loader import stacked_batches
from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import (
    save_result_table,
    snr_sweep_bleu,
    snr_sweep_bleu_fast,
    teacher_forced_sweep,
)
from deepsc_gan_tpu.evaluate.greedy import (
    make_greedy_decode_attack,
    make_greedy_decode_sweep,
)
from deepsc_gan_tpu.models.channel import snr_to_noise
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import (
    create_train_state,
    eval_params,
    make_eval_step,
    make_train_attack_step,
    make_train_multi_step,
)
from deepsc_gan_tpu.utils.config import Config
from scripts.parity_sweep import (
    REF_DATA,
    REF_VOCAB,
    held_out_batches,
    split_data,
)

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

LEVERS = dict(tie_embeddings=True, label_smoothing=0.1, aug_crop=0.2,
              aug_concat=0.2, aug_synth=0.3, train_snr_random=True,
              schedule="cosine", decay_steps=120000,
              # the committed params/tables (results/*.pkl) were trained
              # and evaluated at the reference's L=31; the framework
              # default moved to the lane-aligned 32 (utils/config.py),
              # so regeneration pins 31 to match the saved artifacts
              seq_len=31)


def plain_train(cfg, train_raw, held_batches, vocab, epochs, k, seed,
                eval_every=50, patience=6):
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    multi = make_train_multi_step(model, cfg)
    sweep_fn = make_greedy_decode_sweep(model, cfg)
    ds = make_train_dataset(train_raw, cfg, seed=seed)
    stacker = stacked_batches(ds, k)
    n_std = float(snr_to_noise(cfg.train_snr))
    key = jax.random.PRNGKey(seed + 1)
    snrs = [0, 3, 6, 9, 12, 15, 18]
    best, stale = (-1.0, None, -1), 0
    for epoch in range(1, epochs + 1):
        for _ in range(max(1, len(ds) // k)):
            key, sub = jax.random.split(key)
            b = jnp.asarray(next(stacker))
            state, losses = multi(state, b, b, sub, n_std)
        if epoch % eval_every:
            continue
        table = snr_sweep_bleu_fast(sweep_fn, eval_params(state),
                                    held_batches, vocab, cfg, snrs=snrs,
                                    key=jax.random.PRNGKey(999))
        mean_bleu = float(np.mean([r[1] for r in table]))
        print(f"[plain] ep{epoch} loss={float(losses[-1]):.3f} "
              f"mean={mean_bleu:.4f}", flush=True)
        if mean_bleu > best[0]:
            best = (mean_bleu,
                    jax.tree.map(lambda x: np.asarray(x),
                                 eval_params(state)),
                    epoch)
            stale = 0
        else:
            stale += 1
            if stale >= patience:
                break
    if best[1] is not None:
        state = state.replace(params=jax.tree.map(jnp.asarray, best[1]))
    print(f"[plain] best ep{best[2]} mean={best[0]:.4f}", flush=True)
    return model, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plain-epochs", type=int, default=1200)
    ap.add_argument("--adv-epochs", type=int, default=300)
    ap.add_argument("--adv-weight", type=float, default=0.5)
    ap.add_argument("--epsilon", type=float, default=1.0)
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default="results")
    args = ap.parse_args()

    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2, **LEVERS)
    train_raw, held = split_data(REF_DATA, seed=0)
    vocab = Vocab.load(REF_VOCAB)
    held_batches = held_out_batches(held, cfg)

    model, state = plain_train(cfg, train_raw, held_batches, vocab,
                               args.plain_epochs, args.k, args.seed)

    # FGM-adversarial fine-tune (mixed objective; the reference's
    # trainer.py:30-64 is the adv_weight=1 special case)
    astep = make_train_attack_step(model, cfg, adv_weight=args.adv_weight)
    ds = make_train_dataset(train_raw, cfg, seed=args.seed + 7)
    n_std_train = float(snr_to_noise(cfg.train_snr))
    key = jax.random.PRNGKey(args.seed + 11)
    for epoch in range(1, args.adv_epochs + 1):
        for batch, _ in ds:
            key, sub = jax.random.split(key)
            b = jnp.asarray(batch)
            state, (clean_l, adv_l) = astep(
                state, b, b, sub, args.pnr_db, n_std_train, args.epsilon)
        if epoch % 50 == 0:
            print(f"[adv] ep{epoch} clean={float(clean_l):.3f} "
                  f"adv={float(adv_l):.3f}", flush=True)

    snrs = list(range(0, 19))
    step = make_eval_step(model, cfg)
    table = teacher_forced_sweep(step, state, held_batches, vocab, cfg,
                                 snrs=snrs, pnr_db=args.pnr_db,
                                 epsilon=args.epsilon,
                                 key=jax.random.PRNGKey(99))
    save_result_table(table, os.path.join(args.out_dir,
                                          "eval-robust-ours.pkl"))
    for r in table:
        print(f"TF SNR={r[0]:2.0f} clean={r[1]:.4f} att={r[2]:.4f}",
              flush=True)

    # FGM-attacked greedy sweep (reference test.pkl protocol)
    decode = make_greedy_decode_attack(model, cfg)
    gtable = snr_sweep_bleu(decode, state.params, held_batches, vocab, cfg,
                            snrs=snrs, pnr_db=args.pnr_db,
                            key=jax.random.PRNGKey(99),
                            decode_extra_args=(args.epsilon,))
    save_result_table(gtable, os.path.join(args.out_dir,
                                           "test-robust-ours.pkl"))
    for snr, *ms in gtable:
        print(f"greedy-att SNR={snr:2.0f} bleu={ms[0]:.4f}", flush=True)

    with open(os.path.join(args.out_dir, "robust_params.pkl"), "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, state.params),
                     "adv_weight": args.adv_weight}, f)


if __name__ == "__main__":
    main()
