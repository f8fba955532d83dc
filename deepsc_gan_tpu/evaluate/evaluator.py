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
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from deepsc_gan_tpu.data.vocab import SeqToText, Vocab
from deepsc_gan_tpu.evaluate.metrics import BleuScore, SNR_to_noise
from deepsc_gan_tpu.utils.config import Config


def make_scorers(metric: str = "bleu",
                 bleu_weights=(1.0, 0.0, 0.0, 0.0),
                 bert_path: Optional[str] = None) -> list:
    """Scorer list for `metric` in {bleu, similarity, both} (reference
    scores BLEU and BERT sentence similarity side by side,
    utlis/tools.py:30-103). BERT similarity needs local weights — set
    DEEPSC_BERT_PATH to a local HF checkpoint dir (or have
    bert-base-uncased in the HF cache) and it is picked up automatically;
    in fully offline environments it falls back to the bag-of-words
    `UnigramSimilarity` proxy (a warning is printed)."""
    import os
    import sys

    if bert_path is None:
        bert_path = os.environ.get("DEEPSC_BERT_PATH", "bert-base-uncased")

    from deepsc_gan_tpu.evaluate.metrics import Similarity, UnigramSimilarity

    scorers = []
    if metric in ("bleu", "both"):
        scorers.append(("bleu", BleuScore(*bleu_weights)))
    if metric in ("similarity", "both"):
        try:
            scorers.append(("similarity", Similarity(bert_path)))
        except Exception as e:  # no local BERT weights / no egress
            print(f"[metrics] BERT similarity unavailable ({e}); using "
                  "unigram-cosine fallback", file=sys.stderr)
            scorers.append(("similarity", UnigramSimilarity()))
    if not scorers:
        raise ValueError(f"unknown metric {metric!r}")
    return scorers


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
    metric: str = "bleu",
) -> List[List[float]]:
    """-> [[snr, mean_metric...], ...] rows, reference table format (one
    column per scorer from `make_scorers(metric)`).

    `decode_fn(params, inp, key, pnr_db, n_std, *extra)` is any decoder
    from evaluate.greedy. Batches are (B, seq_len) int32 arrays."""
    key = key if key is not None else jax.random.PRNGKey(0)
    s2t = SeqToText(vocab, cfg.end_idx)
    scorers = make_scorers(metric, bleu_weights)
    table = []
    for snr in snrs:
        n_std = SNR_to_noise(snr)
        scores = [[] for _ in scorers]
        for bi, inp in enumerate(batches):
            key, sub = jax.random.split(key)
            out = decode_fn(params, inp, sub, pnr_db, n_std,
                            *decode_extra_args)
            ids = np.asarray(out[0] if isinstance(out, tuple) else out)
            # skip the leading <START> like the reference notebooks did
            hyp = [s2t.sequence_to_text(row[1:]) for row in ids]
            ref = [s2t.sequence_to_text(row[1:]) for row in np.asarray(inp)]
            for si, (_, sc) in enumerate(scorers):
                scores[si].extend(sc.compute_score(ref, hyp))
        table.append([float(snr)] + [float(np.mean(s)) for s in scores])
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
    metric: str = "bleu",
) -> List[List[float]]:
    """Like snr_sweep_bleu but decodes ALL SNR points per batch in one
    device call via evaluate.greedy.make_greedy_decode_sweep — one dispatch
    per batch instead of len(snrs) (the TPU may sit behind a
    high-latency tunnel, and the decode compute is tiny)."""
    import jax.numpy as jnp

    key = key if key is not None else jax.random.PRNGKey(0)
    s2t = SeqToText(vocab, cfg.end_idx)
    scorers = make_scorers(metric, bleu_weights)
    n_stds = jnp.asarray([SNR_to_noise(s) for s in snrs], jnp.float32)
    scores = [[[] for _ in scorers] for _ in snrs]
    for inp in batches:
        key, sub = jax.random.split(key)
        ids = np.asarray(sweep_fn(params, inp, sub, pnr_db, n_stds))
        ref = [s2t.sequence_to_text(row[1:]) for row in np.asarray(inp)]
        for si in range(len(snrs)):
            hyp = [s2t.sequence_to_text(row[1:]) for row in ids[si]]
            for mi, (_, sc) in enumerate(scorers):
                scores[si][mi].extend(sc.compute_score(ref, hyp))
    return [[float(s)] + [float(np.mean(m)) for m in sc]
            for s, sc in zip(snrs, scores)]


def teacher_forced_sweep(
    step_fn: Callable,
    state,
    batches: Sequence[np.ndarray],
    vocab: Vocab,
    cfg: Config,
    snrs: Sequence[float] = tuple(range(0, 19)),
    pnr_db: float = 0.0,
    epsilon: float = 1.0,
    key=None,
    metric: str = "bleu",
    bleu_weights=(1.0, 0.0, 0.0, 0.0),
) -> List[List[float]]:
    """Teacher-forced eval table in the reference's `eval.pkl` layout
    (`DeepSC-GAN/utlis/eval.py:189-232` + `log/eval-D-GAN-STAR/eval.pkl`):
    the clean and attacked PREDICTIONS are argmaxed, converted to text and
    scored — not just the losses. Rows:

        [snr, clean_metric..., attacked_metric..., loss_clean, loss_attacked]

    `step_fn` is any of make_eval_step / make_eval_step_pgd /
    make_gan_eval_step — all return
    (clean_loss, attacked_loss, clean_logits, attacked_logits, ...)."""
    import jax.numpy as jnp

    key = key if key is not None else jax.random.PRNGKey(0)
    s2t = SeqToText(vocab, cfg.end_idx)
    scorers = make_scorers(metric, bleu_weights)

    # argmax ON DEVICE: the raw (B, L, 22234) f32 logit pair is ~340MB per
    # batch — pulling that device->host per call dominates (and over a
    # tunneled TPU, breaks) the sweep; (B, L) int32 ids are ~7KB.
    # step_fn may itself be jitted: tracing through a jitted callee
    # inlines it, so this composes on public API.
    @jax.jit
    def step_ids(state, inp, tar, k, pnr, n_std, eps):
        out = step_fn(state, inp, tar, k, pnr, n_std, eps)
        return (out[0], out[1],
                jnp.argmax(out[2], axis=-1).astype(jnp.int32),
                jnp.argmax(out[3], axis=-1).astype(jnp.int32))

    table = []
    for snr in snrs:
        n_std = SNR_to_noise(snr)
        cls, als = [], []
        cscores = [[] for _ in scorers]
        ascores = [[] for _ in scorers]
        for inp in batches:
            key, sub = jax.random.split(key)
            out = step_ids(state, inp, inp, sub, pnr_db, n_std, epsilon)
            cls.append(float(out[0]))
            als.append(float(out[1]))
            # teacher-forced logits predict the shifted target: position i
            # scores token inp[:, i+1] — so reference texts drop <START>
            ref = [s2t.sequence_to_text(row[1:]) for row in np.asarray(inp)]
            for ids, dest in ((np.asarray(out[2]), cscores),
                              (np.asarray(out[3]), ascores)):
                if ids.shape[1] == inp.shape[1]:
                    # star decoders score the UN-shifted target (position i
                    # predicts token i) — drop the predicted <START> slot
                    ids = ids[:, 1:]
                hyp = [s2t.sequence_to_text(row) for row in ids]
                for mi, (_, sc) in enumerate(scorers):
                    dest[mi].extend(sc.compute_score(ref, hyp))
        table.append(
            [float(snr)]
            + [float(np.mean(s)) for s in cscores]
            + [float(np.mean(s)) for s in ascores]
            + [float(np.mean(cls)), float(np.mean(als))])
    return table


def save_result_table(table: List[List[float]], path: str) -> None:
    """Pickle a results table in the reference layout
    (log/eval-D-GAN-STAR/*.pkl: a list of [snr, metric...] rows)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(table, f)


def load_result_table(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
