"""SNR-sweep evaluation producing reference-format BLEU tables.

The reference's published baseline is pickled `[[snr, bleu...], ...]`
tables (`DeepSC-GAN/log/eval-D-GAN-STAR/*.pkl`, SURVEY.md §6) produced by
notebook drivers sweeping SNR 0-18 dB over the test set with greedy decode
+ `BleuScore(1,0,0,0)`. This module is that driver, committed: sweep,
decode, score, write a byte-compatible pickle.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, List, Sequence

import jax
import numpy as np

from deepsc_gan_tpu.data.vocab import SeqToText, Vocab
from deepsc_gan_tpu.evaluate.metrics import BleuScore, SNR_to_noise
from deepsc_gan_tpu.utils.config import Config


def snr_sweep_bleu(
    decode_fn: Callable,
    params,
    batches: Sequence[np.ndarray],
    vocab: Vocab,
    cfg: Config,
    snrs: Sequence[float] = tuple(range(0, 19)),
    pnr_db: float = 0.0,
    key=None,
    bleu_weights=(1.0, 0.0, 0.0, 0.0),
    decode_extra_args: tuple = (),
) -> List[List[float]]:
    """-> [[snr, mean_bleu], ...] rows, reference table format.

    `decode_fn(params, inp, key, pnr_db, n_std, *extra)` is any decoder
    from evaluate.greedy. Batches are (B, seq_len) int32 arrays."""
    key = key if key is not None else jax.random.PRNGKey(0)
    s2t = SeqToText(vocab, cfg.end_idx)
    bleu = BleuScore(*bleu_weights)
    table = []
    for snr in snrs:
        n_std = SNR_to_noise(snr)
        scores: List[float] = []
        for bi, inp in enumerate(batches):
            key, sub = jax.random.split(key)
            out = decode_fn(params, inp, sub, pnr_db, n_std,
                            *decode_extra_args)
            ids = np.asarray(out[0] if isinstance(out, tuple) else out)
            # skip the leading <START> like the reference notebooks did
            hyp = [s2t.sequence_to_text(row[1:]) for row in ids]
            ref = [s2t.sequence_to_text(row[1:]) for row in np.asarray(inp)]
            scores.extend(bleu.compute_score(ref, hyp))
        table.append([float(snr), float(np.mean(scores))])
    return table


def snr_sweep_bleu_fast(
    sweep_fn: Callable,
    params,
    batches: Sequence[np.ndarray],
    vocab: Vocab,
    cfg: Config,
    snrs: Sequence[float] = tuple(range(0, 19)),
    pnr_db: float = 0.0,
    key=None,
    bleu_weights=(1.0, 0.0, 0.0, 0.0),
) -> List[List[float]]:
    """Like snr_sweep_bleu but decodes ALL SNR points per batch in one
    device call via evaluate.greedy.make_greedy_decode_sweep — one dispatch
    per batch instead of len(snrs) (the TPU may sit behind a
    high-latency tunnel, and the decode compute is tiny)."""
    import jax.numpy as jnp

    key = key if key is not None else jax.random.PRNGKey(0)
    s2t = SeqToText(vocab, cfg.end_idx)
    bleu = BleuScore(*bleu_weights)
    n_stds = jnp.asarray([SNR_to_noise(s) for s in snrs], jnp.float32)
    scores = [[] for _ in snrs]
    for inp in batches:
        key, sub = jax.random.split(key)
        ids = np.asarray(sweep_fn(params, inp, sub, pnr_db, n_stds))
        ref = [s2t.sequence_to_text(row[1:]) for row in np.asarray(inp)]
        for si in range(len(snrs)):
            hyp = [s2t.sequence_to_text(row[1:]) for row in ids[si]]
            scores[si].extend(bleu.compute_score(ref, hyp))
    return [[float(s), float(np.mean(sc))] for s, sc in zip(snrs, scores)]


def save_result_table(table: List[List[float]], path: str) -> None:
    """Pickle a results table in the reference layout
    (log/eval-D-GAN-STAR/*.pkl: a list of [snr, metric...] rows)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(table, f)


def load_result_table(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
