"""Star-Transformer robustness tables — the `eval_step_star` protocol
(reference utlis/eval.py:321-365: teacher-forced FGM eval scoring against
the FULL un-shifted target) on a plain-trained star AND an
FGM-adversarially fine-tuned star. The reference repo's own name
(D-GAN-STAR) is about adversarial robustness of the star codec; its
committed star artifacts are clean curves only — these tables measure the
robustness story on the star variant directly.

Outputs:
  results/eval-star-ours.pkl         plain star, [snr, bleu_c, bleu_a, ...]
  results/eval-star-robust-ours.pkl  FGM-fine-tuned star, same rows
  results/test-star-att-ours.pkl     robust star, single-shot greedy under
                                     FGM attack (test.pkl protocol shape)

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
from scripts.robust_tables import LEVERS

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def train_star(cfg, train_raw, held_batches, vocab, epochs, k, seed,
               eval_every=50, patience=6):
    """Headline-recipe star training with held-out keep-best (single-shot
    decode eval, star_quality.py protocol)."""
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    multi = make_train_multi_step(model, cfg, full_target=True)
    sweep_fn = make_greedy_decode_sweep(model, cfg, position_mode="oneshot")
    ds = make_train_dataset(train_raw, cfg, seed=seed)
    stacker = stacked_batches(ds, k)
    n_std = float(snr_to_noise(cfg.train_snr))
    key = jax.random.PRNGKey(seed + 1)
    snrs7 = [0, 3, 6, 9, 12, 15, 18]
    best, stale = (-1.0, None, -1), 0
    for epoch in range(1, epochs + 1):
        for _ in range(max(1, len(ds) // k)):
            key, sub = jax.random.split(key)
            b = jnp.asarray(next(stacker))
            state, losses = multi(state, b, b, sub, n_std)
        if epoch % eval_every and epoch != epochs:
            continue
        table = snr_sweep_bleu_fast(sweep_fn, state.params, held_batches,
                                    vocab, cfg, snrs=snrs7,
                                    key=jax.random.PRNGKey(999))
        mean_bleu = float(np.mean([r[1] for r in table]))
        print(f"[star] ep{epoch} loss={float(losses[-1]):.3f} "
              f"mean={mean_bleu:.4f}", flush=True)
        if mean_bleu > best[0]:
            best = (mean_bleu, jax.tree.map(np.asarray, state.params),
                    epoch)
            stale = 0
        else:
            stale += 1
            if stale >= patience:
                break
    state = state.replace(params=jax.tree.map(jnp.asarray, best[1]))
    print(f"[star] best ep{best[2]} mean={best[0]:.4f}", flush=True)
    return model, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--adv-epochs", type=int, default=200)
    ap.add_argument("--adv-weight", type=float, default=0.5)
    ap.add_argument("--epsilon", type=float, default=1.0)
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--eval-batches", type=int, default=0)
    ap.add_argument("--snr-stride", type=int, default=1)
    ap.add_argument("--limit-train", type=int, default=0)
    args = ap.parse_args()

    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2, **LEVERS)
    train_raw, held = split_data(REF_DATA, seed=0)
    if args.limit_train:
        train_raw = train_raw[: args.limit_train]
    vocab = Vocab.load(REF_VOCAB)
    held_batches = held_out_batches(held, cfg, limit=args.eval_batches)
    snrs = list(range(0, 19, args.snr_stride))

    model, state = train_star(cfg, train_raw, held_batches, vocab,
                              args.epochs, args.k, args.seed)

    # eval_step_star protocol on the PLAIN star (full un-shifted target)
    estep = make_eval_step(model, cfg, full_target=True)
    table = teacher_forced_sweep(estep, state, held_batches, vocab, cfg,
                                 snrs=snrs, pnr_db=args.pnr_db,
                                 epsilon=args.epsilon,
                                 key=jax.random.PRNGKey(99))
    save_result_table(table, os.path.join(args.out_dir,
                                          "eval-star-ours.pkl"))
    for r in table:
        print(f"TF-plain SNR={r[0]:2.0f} clean={r[1]:.4f} att={r[2]:.4f}",
              flush=True)

    # FGM-adversarial fine-tune (mixed objective, full target)
    astep = make_train_attack_step(model, cfg, full_target=True,
                                   adv_weight=args.adv_weight)
    ds = make_train_dataset(train_raw, cfg, seed=args.seed + 7)
    n_std = float(snr_to_noise(cfg.train_snr))
    key = jax.random.PRNGKey(args.seed + 11)
    for epoch in range(1, args.adv_epochs + 1):
        for batch, _ in ds:
            key, sub = jax.random.split(key)
            b = jnp.asarray(batch)
            state, (clean_l, adv_l) = astep(state, b, b, sub, args.pnr_db,
                                            n_std, args.epsilon)
        if epoch % 50 == 0:
            print(f"[adv] ep{epoch} clean={float(clean_l):.3f} "
                  f"adv={float(adv_l):.3f}", flush=True)

    table = teacher_forced_sweep(estep, state, held_batches, vocab, cfg,
                                 snrs=snrs, pnr_db=args.pnr_db,
                                 epsilon=args.epsilon,
                                 key=jax.random.PRNGKey(99))
    save_result_table(table, os.path.join(args.out_dir,
                                          "eval-star-robust-ours.pkl"))
    for r in table:
        print(f"TF-robust SNR={r[0]:2.0f} clean={r[1]:.4f} att={r[2]:.4f}",
              flush=True)

    # attacked single-shot greedy on the robust star
    decode = make_greedy_decode_attack(model, cfg,
                                   position_mode="oneshot",
                                   full_target=True)
    gtable = snr_sweep_bleu(decode, state.params, held_batches, vocab, cfg,
                            snrs=snrs, pnr_db=args.pnr_db,
                            key=jax.random.PRNGKey(99),
                            decode_extra_args=(args.epsilon,))
    save_result_table(gtable, os.path.join(args.out_dir,
                                           "test-star-att-ours.pkl"))
    for snr, *ms in gtable:
        print(f"greedy-att SNR={snr:2.0f} bleu={ms[0]:.4f}", flush=True)

    with open(os.path.join(args.out_dir, "star_robust_params.pkl"),
              "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, state.params)}, f)


if __name__ == "__main__":
    main()
