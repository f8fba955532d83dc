"""Vanilla-BLEU parity sweep (round-2 item #1, VERDICT.md).

Trains the vanilla transceiver under a grid of quality levers — tied
embeddings, label smoothing, augmentation (crop/concat/synthetic
full-vocab), dropout — on the 90/10 split of the only committed corpus
(the reference's 7,347-sentence `test_data.pkl`; the ~66k `train_data.pkl`
does not exist in this environment), evaluating held-out greedy BLEU-1
per SNR exactly as the reference's `test-DeepSC.pkl` protocol
(`DeepSC-GAN/utlis/eval.py:78-117` + `BleuScore(1,0,0,0)`).

Each config trains with the multi-step scan path (`make_train_multi_step`,
K steps per dispatch — the TPU sits behind a high-latency tunnel), evals
every --eval-every epochs, early-stops on mean held-out BLEU, and appends
one JSONL row per eval to --out. Best params per config are pickled next
to it for the final 19-point table run.

Run ONE process at a time on the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deepsc_gan_tpu.data.augment import make_train_dataset
from deepsc_gan_tpu.data.loader import (
    load_token_lists,
    pad_sequences,
    stacked_batches,
)
from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu_fast
from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
from deepsc_gan_tpu.models.channel import snr_to_noise
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import create_train_state, make_train_multi_step
from deepsc_gan_tpu.utils.config import Config

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REF_DATA = "/root/reference/DeepSC-GAN/data/txt/test_data.pkl"
REF_VOCAB = "/root/reference/DeepSC-GAN/data/txt/vocab.json"

# name -> Config overrides beyond the shared base
GRID = {
    "tie":          dict(tie_embeddings=True),
    "tie_ls":       dict(tie_embeddings=True, label_smoothing=0.1),
    "tie_aug":      dict(tie_embeddings=True, aug_crop=0.25, aug_concat=0.25),
    "tie_synth":    dict(tie_embeddings=True, aug_crop=0.2, aug_concat=0.2,
                         aug_synth=0.2),
    "tie_synth_hi": dict(tie_embeddings=True, aug_crop=0.15, aug_concat=0.15,
                         aug_synth=0.5),
    "tie_synth_ls": dict(tie_embeddings=True, aug_crop=0.2, aug_concat=0.2,
                         aug_synth=0.2, label_smoothing=0.1),
    "tie_synth_d3": dict(tie_embeddings=True, aug_crop=0.2, aug_concat=0.2,
                         aug_synth=0.2, encoder_dropout=0.3,
                         decoder_dropout=0.3),
    "untied_synth": dict(aug_crop=0.2, aug_concat=0.2, aug_synth=0.2),
    # phase 2: combinations for the long final runs
    "final_fixed": dict(tie_embeddings=True, label_smoothing=0.1,
                        aug_crop=0.2, aug_concat=0.2, aug_synth=0.3),
    "final_rand": dict(tie_embeddings=True, label_smoothing=0.1,
                       aug_crop=0.2, aug_concat=0.2, aug_synth=0.3,
                       train_snr_random=True),
    "final_rand_cos": dict(tie_embeddings=True, label_smoothing=0.1,
                           aug_crop=0.2, aug_concat=0.2, aug_synth=0.3,
                           train_snr_random=True, schedule="cosine",
                           decay_steps=120000),
    # fixed-3dB / uniform mixture: keep final_rand's high-SNR wins while
    # restoring the low-SNR mass that fixed-SNR training provides
    "final_mix": dict(tie_embeddings=True, label_smoothing=0.1,
                      aug_crop=0.2, aug_concat=0.2, aug_synth=0.3,
                      train_snr_random=True, train_snr_mix=0.5),
    "final_mix30": dict(tie_embeddings=True, label_smoothing=0.1,
                        aug_crop=0.2, aug_concat=0.2, aug_synth=0.3,
                        train_snr_random=True, train_snr_mix=0.3),
}


def split_data(path: str, seed: int = 0):
    raw = load_token_lists(path)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(raw))
    n_train = int(len(raw) * 0.9)
    train = [raw[i] for i in idx[:n_train]]
    held = [raw[i] for i in idx[n_train:]]
    return train, held


def held_out_batches(held, cfg, limit: int = 0):
    """Pad the held-out sentences to cfg.seq_len and slice full batches
    (tail remainder dropped, matching the loader's drop-remainder
    protocol). Shared by every measurement script."""
    from deepsc_gan_tpu.data.loader import pad_sequences

    padded = pad_sequences(held, maxlen=cfg.seq_len)
    batches = [padded[i : i + cfg.bs]
               for i in range(0, len(padded) - cfg.bs + 1, cfg.bs)]
    return batches[:limit] if limit else batches


def run_config(name: str, cfg: Config, train_raw, held_batches, vocab,
               args, out_f):
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed))
    multi = make_train_multi_step(model, cfg)
    sweep_fn = make_greedy_decode_sweep(model, cfg)
    ds = make_train_dataset(train_raw, cfg, seed=args.seed)
    stacker = stacked_batches(ds, args.k)
    n_std = float(snr_to_noise(cfg.train_snr))
    snrs = [0, 3, 6, 9, 12, 15, 18]
    key = jax.random.PRNGKey(args.seed + 1)
    eval_key = jax.random.PRNGKey(999)  # fixed: comparable evals
    dispatches_per_epoch = max(1, len(ds) // args.k)

    best = (-1.0, None, -1)  # (mean_bleu, params_host, epoch)
    stale = 0
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        for _ in range(dispatches_per_epoch):
            key, sub = jax.random.split(key)
            batch = jnp.asarray(next(stacker))
            state, losses = multi(state, batch, batch, sub, n_std)
        if epoch % args.eval_every:
            continue
        loss = float(losses[-1])  # sync point
        table = snr_sweep_bleu_fast(sweep_fn, state.params, held_batches,
                                    vocab, cfg, snrs=snrs, key=eval_key)
        mean_bleu = float(np.mean([r[1] for r in table]))
        row = dict(config=name, epoch=epoch, loss=loss,
                   mean_bleu=mean_bleu,
                   bleu={str(int(s)): round(b, 4) for s, b in table},
                   elapsed=round(time.time() - t0, 1))
        out_f.write(json.dumps(row) + "\n")
        out_f.flush()
        print(f"[{name}] ep{epoch} loss={loss:.3f} mean={mean_bleu:.4f} "
              f"{[round(b, 3) for _, b in table]}", flush=True)
        if mean_bleu > best[0]:
            best = (mean_bleu,
                    jax.tree.map(lambda x: np.asarray(x), state.params),
                    epoch)
            stale = 0
        else:
            stale += 1
            if stale >= args.patience:
                print(f"[{name}] early stop at ep{epoch} "
                      f"(best ep{best[2]} mean={best[0]:.4f})", flush=True)
                break

    if best[1] is not None:
        with open(os.path.join(args.log_dir, f"{name}_best.pkl"), "wb") as f:
            # record seq_len so downstream table scripts (final_tables.py)
            # evaluate under the same padded length the params were
            # trained at (the framework default moved from 31 to 32)
            pickle.dump({"params": best[1], "epoch": best[2],
                         "mean_bleu": best[0],
                         "overrides": {**GRID.get(name, {}),
                                       "seq_len": cfg.seq_len}}, f)
    return best[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-pkl", default=REF_DATA)
    ap.add_argument("--vocab", default=REF_VOCAB)
    ap.add_argument("--log-dir", default="log/parity")
    ap.add_argument("--configs", default="all",
                    help="comma list of GRID names, or 'all'")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--patience", type=int, default=5)
    ap.add_argument("--k", type=int, default=16,
                    help="train steps fused per dispatch")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-frac", type=float, default=1.0,
                    help="fraction of the train split to use (scaling curve)")
    ap.add_argument("--seq-len", type=int, default=31,
                    help="padded sentence length (31 = reference parity; "
                    "32 = lane-aligned layout, +10% step throughput at the "
                    "flagship shape — bench.py --seq-ab)")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    os.makedirs(args.log_dir, exist_ok=True)
    base = Config(encoder_dropout=0.2, decoder_dropout=0.2,
                  seq_len=args.seq_len)
    train_raw, held = split_data(args.data_pkl, seed=0)
    if args.train_frac < 1.0:
        train_raw = train_raw[: int(len(train_raw) * args.train_frac)]
    vocab = Vocab.load(args.vocab)
    held_pad = pad_sequences(held, maxlen=base.seq_len)
    held_batches = [held_pad[i : i + base.bs]
                    for i in range(0, len(held_pad) - base.bs + 1, base.bs)]
    print(f"train={len(train_raw)} held={len(held_batches) * base.bs} "
          f"devices={jax.devices()}", flush=True)

    names = list(GRID) if args.configs == "all" else args.configs.split(",")
    out_path = os.path.join(args.log_dir,
                            f"sweep{('_' + args.tag) if args.tag else ''}.jsonl")
    results = {}
    with open(out_path, "a") as out_f:
        for name in names:
            cfg = base.replace(**GRID[name]) if name in GRID else base
            print(f"=== {name}: {GRID.get(name, {})}", flush=True)
            results[name] = run_config(name, cfg, train_raw, held_batches,
                                       vocab, args, out_f)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
