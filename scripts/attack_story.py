"""Reproduce the reference's core experimental story on the available data:

  1. plain-trained transceiver: clean vs FGM-attacked teacher-forced loss
     across SNR (attack should hurt);
  2. FGM-adversarially-trained transceiver: the attacked loss recovers;
  3. GAN-trained transceiver: robustness via the learned perturbation
     generator.

Writes reference-format result tables to --log-dir and prints a summary.
Run on TPU (one process at a time — the chip is behind a tunnel).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepsc_gan_tpu.data.loader import load_token_lists, pad_sequences, Dataset
from deepsc_gan_tpu.evaluate.evaluator import save_result_table
from deepsc_gan_tpu.models.channel import snr_to_noise
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.gan_steps import make_gan_eval_step, make_gan_train_step
from deepsc_gan_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_attack_step,
    make_train_step,
)
from deepsc_gan_tpu.utils.config import Config

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def train(model, cfg, step_call, ds, key, epochs, gan=False):
    """step_call(state, inp, tar, key, n_std) -> (state, metrics)."""
    state = create_train_state(model, cfg, key,
                               **({"traingan": True} if gan else {}))
    n_std = float(snr_to_noise(cfg.train_snr))
    for epoch in range(epochs):
        for inp, tar in ds:
            key, sub = jax.random.split(key)
            state, metrics = step_call(state, inp, tar, sub, n_std)
        jax.block_until_ready(state.params)
        first = metrics[0] if isinstance(metrics, tuple) else metrics
        print(f"  epoch {epoch+1}/{epochs} loss={float(first):.3f}",
              flush=True)
    return state


def eval_attack(model, cfg, state, batches, key, pnr_db, snrs, gan=False):
    step = (make_gan_eval_step(model, cfg) if gan
            else make_eval_step(model, cfg, attack_target="y"))
    rows = []
    for snr in snrs:
        n_std = float(snr_to_noise(snr))
        cl, al = [], []
        for inp in batches:
            key, sub = jax.random.split(key)
            out = step(state, inp, inp, sub, pnr_db, n_std, 1.0)
            cl.append(float(out[0]))
            al.append(float(out[1]))
        rows.append([snr, float(np.mean(cl)), float(np.mean(al))])
        print(f"  SNR={snr} clean={rows[-1][1]:.3f} "
              f"attacked={rows[-1][2]:.3f}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-pkl", default="/tmp/demo_train.pkl")
    ap.add_argument("--test-pkl", default="/tmp/demo_test.pkl")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--log-dir", default="/tmp/attack_story")
    ap.add_argument("--eval-batches", type=int, default=6)
    args = ap.parse_args()

    cfg = Config()
    key = jax.random.PRNGKey(0)
    train_ds = Dataset(pad_sequences(load_token_lists(args.train_pkl),
                                     cfg.seq_len), cfg.bs, seed=0)
    test = pad_sequences(load_token_lists(args.test_pkl), cfg.seq_len)
    batches = [test[i:i + cfg.bs] for i in range(0, len(test), cfg.bs)
               if len(test[i:i + cfg.bs]) == cfg.bs][: args.eval_batches]
    snrs = [0, 3, 6, 9, 12, 15, 18]
    os.makedirs(args.log_dir, exist_ok=True)

    print("[1/3] plain training", flush=True)
    model = make_model(cfg, "transformer")
    step = make_train_step(model, cfg)
    st_plain = train(model, cfg, step, train_ds, key, args.epochs)
    print("[1/3] FGM-attacked eval (plain model)", flush=True)
    t1 = eval_attack(model, cfg, st_plain, batches, key, args.pnr_db, snrs)
    save_result_table(t1, os.path.join(args.log_dir, "plain.pkl"))

    print("[2/3] FGM-adversarial training", flush=True)
    astep = make_train_attack_step(model, cfg)
    adv_call = lambda st, i, t, k, n: astep(st, i, t, k, args.pnr_db, n, 1.0)
    st_adv = train(model, cfg, adv_call, train_ds, jax.random.PRNGKey(1),
                   args.epochs)
    print("[2/3] FGM-attacked eval (adversarially trained)", flush=True)
    t2 = eval_attack(model, cfg, st_adv, batches, key, args.pnr_db, snrs)
    save_result_table(t2, os.path.join(args.log_dir, "adv.pkl"))

    print("[3/3] GAN training", flush=True)
    gmodel = make_model(cfg, "gan")
    gstep = make_gan_train_step(gmodel, cfg)
    st_gan = train(gmodel, cfg, gstep, train_ds, jax.random.PRNGKey(2),
                   args.epochs, gan=True)
    print("[3/3] FGM-attacked eval (GAN-trained)", flush=True)
    t3 = eval_attack(gmodel, cfg, st_gan, batches, key, args.pnr_db, snrs,
                     gan=True)
    save_result_table(t3, os.path.join(args.log_dir, "gan.pkl"))

    print("\nsummary (loss @ SNR, clean / attacked):")
    for name, t in [("plain", t1), ("adversarial", t2), ("gan", t3)]:
        mid = t[len(t) // 2]
        print(f"  {name:12s} @ {mid[0]}dB: {mid[1]:.3f} / {mid[2]:.3f}")


if __name__ == "__main__":
    main()
