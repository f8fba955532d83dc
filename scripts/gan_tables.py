"""GAN-trained config tables — the THIRD config group of the reference's
3-config `eval.pkl` artifact (plain -> eval-transformer-ours.pkl,
FGM-adversarial -> eval-robust-ours.pkl, GAN -> this script).

Protocol:
  1. plain training with the headline recipe (held-out keep-best) on the
     vanilla transceiver — or reuse --plain-params from a prior run;
  2. warm-start the GAN transceiver's codec from those params (fresh
     generator) and run 3-phase GAN training (reference
     gan_train.py:8-50 semantics via selective_update), keep-best by
     mean clean+attacked teacher-forced BLEU;
  3. teacher-forced FGM sweep (reference eval_step_FGM, eval.py:367-409)
     -> results/eval-gan-ours.pkl, rows
     [snr, bleu_clean, bleu_attacked, loss_clean, loss_attacked];
  4. FGM-attacked greedy sweep (reference greedy_decode_gan,
     eval.py:120-187) -> results/test-gan-ours.pkl.

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
from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import (
    save_result_table,
    snr_sweep_bleu,
    teacher_forced_sweep,
)
from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_gan
from deepsc_gan_tpu.models.channel import snr_to_noise
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.gan_steps import (
    make_gan_eval_step,
    make_gan_train_step,
)
from deepsc_gan_tpu.train.steps import create_train_state
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

CODEC_KEYS = ("semantic_encoder", "semantic_decoder",
              "channel_encoder", "channel_decoder")


def graft_codec(gan_params, plain_params):
    """Copy the shared codec submodules from a plain-trained transceiver
    into a freshly initialized GAN param tree (generator stays fresh)."""
    out = dict(gan_params)
    for k in CODEC_KEYS:
        out[k] = plain_params[k]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plain-epochs", type=int, default=1200)
    ap.add_argument("--plain-params", default="results/plain_best_params.pkl",
                    help="reuse plain-phase best params if this file exists")
    ap.add_argument("--gan-epochs", type=int, default=150)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--epsilon", type=float, default=1.0)
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--eval-batches", type=int, default=0,
                    help="cap held-out batches in the final sweeps (0=all)")
    ap.add_argument("--limit-train", type=int, default=0,
                    help="cap training sentences (smoke runs; 0=all)")
    ap.add_argument("--snr-stride", type=int, default=1,
                    help="stride over the 0..18 dB grid (smoke runs)")
    args = ap.parse_args()

    cfg = Config(encoder_dropout=0.2, decoder_dropout=0.2, **LEVERS)
    train_raw, held = split_data(REF_DATA, seed=0)
    if args.limit_train:
        train_raw = train_raw[: args.limit_train]
    vocab = Vocab.load(REF_VOCAB)
    held_batches = held_out_batches(held, cfg)

    if os.path.exists(args.plain_params):
        with open(args.plain_params, "rb") as f:
            plain = pickle.load(f)["params"]
        print(f"[plain] reusing {args.plain_params}", flush=True)
    else:
        _, pstate = plain_train(cfg, train_raw, held_batches, vocab,
                                args.plain_epochs, args.k, args.seed)
        plain = jax.tree.map(np.asarray, pstate.params)
        with open(args.plain_params, "wb") as f:
            pickle.dump({"params": plain, "recipe": LEVERS}, f)

    # --- GAN phase: warm-start codec, fresh generator, 3-phase updates ---
    model = make_model(cfg, "gan")
    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed),
                               traingan=True)
    state = state.replace(
        params=graft_codec(state.params, jax.tree.map(jnp.asarray, plain)))
    gstep = make_gan_train_step(model, cfg)
    estep = make_gan_eval_step(model, cfg)
    ds = make_train_dataset(train_raw, cfg, seed=args.seed + 3)
    n_std = float(snr_to_noise(cfg.train_snr))
    key = jax.random.PRNGKey(args.seed + 5)
    probe_snrs = [0, 9, 18]
    best = (-1.0, None, -1)
    for epoch in range(1, args.gan_epochs + 1):
        for batch, _ in ds:
            key, sub = jax.random.split(key)
            b = jnp.asarray(batch)
            state, (loss, g_loss, d_loss) = gstep(state, b, b, sub, n_std)
        # probe on the schedule AND at the final epoch, so trailing epochs
        # are never silently excluded from keep-best selection
        if epoch % args.eval_every and epoch != args.gan_epochs:
            continue
        probe = teacher_forced_sweep(estep, state, held_batches[:4], vocab,
                                     cfg, snrs=probe_snrs,
                                     pnr_db=args.pnr_db,
                                     epsilon=args.epsilon,
                                     key=jax.random.PRNGKey(999))
        score = float(np.mean([r[1] + r[2] for r in probe])) / 2.0
        print(f"[gan] ep{epoch} loss={float(loss):.3f} "
              f"g={float(g_loss):.3f} d={float(d_loss):.3f} "
              f"probe={score:.4f}", flush=True)
        if score > best[0]:
            best = (score, jax.tree.map(np.asarray, state.params), epoch)
    if best[1] is not None:
        state = state.replace(params=jax.tree.map(jnp.asarray, best[1]))
    print(f"[gan] best ep{best[2]} probe={best[0]:.4f}", flush=True)

    snrs = list(range(0, 19, args.snr_stride))
    if args.eval_batches:
        held_batches = held_batches[: args.eval_batches]
    table = teacher_forced_sweep(estep, state, held_batches, vocab, cfg,
                                 snrs=snrs, pnr_db=args.pnr_db,
                                 epsilon=args.epsilon,
                                 key=jax.random.PRNGKey(99))
    save_result_table(table, os.path.join(args.out_dir, "eval-gan-ours.pkl"))
    for r in table:
        print(f"TF SNR={r[0]:2.0f} clean={r[1]:.4f} att={r[2]:.4f}",
              flush=True)

    decode = make_greedy_decode_gan(model, cfg)
    gtable = snr_sweep_bleu(decode, state.params, held_batches, vocab, cfg,
                            snrs=snrs, pnr_db=args.pnr_db,
                            key=jax.random.PRNGKey(99),
                            decode_extra_args=(args.epsilon,))
    save_result_table(gtable, os.path.join(args.out_dir,
                                           "test-gan-ours.pkl"))
    for snr, *ms in gtable:
        print(f"greedy-att SNR={snr:2.0f} bleu={ms[0]:.4f}", flush=True)

    with open(os.path.join(args.out_dir, "gan_params.pkl"), "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, state.params)}, f)


if __name__ == "__main__":
    main()
