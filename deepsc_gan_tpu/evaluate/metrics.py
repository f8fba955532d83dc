"""Text metrics: BLEU, SNR conversion, BERT sentence similarity.

Behavioral spec from the reference (`DeepSC-GAN/utlis/tools.py:30-103`).
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np

_TAG_RE = re.compile(r"<[^>]*>")


def _remove_tags(s: str) -> str:
    # the reference strips XML-ish tags from both sides before scoring
    # (tools.py:40-41, via w3lib)
    return _TAG_RE.sub("", s)


class BleuScore:
    """Per-sentence BLEU with configurable 1-4-gram weights (reference
    `BleuScore`, tools.py:30-43, backed by NLTK `sentence_bleu`).

    Fast path: words are interned to int ids and scored by the native C++
    batch scorer (native/bleu.cc — exact NLTK semantics incl. method0
    zero-numerator handling and brevity penalty, fuzz-tested against NLTK
    in tests/test_native.py). Falls back to NLTK when the native library
    is unavailable or `native=False`."""

    def __init__(self, w1: float, w2: float, w3: float, w4: float,
                 native: bool = True):
        self.weights = (w1, w2, w3, w4)
        self.native = native

    def _compute_native(self, real, predicted):
        from deepsc_gan_tpu import native as nat

        intern: dict = {}

        def ids(sent):
            return [intern.setdefault(w, len(intern))
                    for w in _remove_tags(sent).split()]

        refs = [ids(s) for s in real]
        hyps = [ids(s) for s in predicted]
        return nat.bleu_batch(refs, hyps, self.weights).tolist()

    def compute_score(self, real: Sequence[str], predicted: Sequence[str]) -> List[float]:
        if self.native:
            try:
                return self._compute_native(real, predicted)
            except (RuntimeError, ImportError):
                pass  # no compiler in this environment -> NLTK
        from nltk.translate.bleu_score import sentence_bleu

        scores = []
        for sent1, sent2 in zip(real, predicted):
            ref = _remove_tags(sent1).split()
            hyp = _remove_tags(sent2).split()
            scores.append(sentence_bleu([ref], hyp, weights=self.weights))
        return scores


def SNR_to_noise(snr) -> float:
    """SNR dB -> noise std (reference tools.py:46-50)."""
    return float(1.0 / np.sqrt(10.0 ** (np.asarray(snr, np.float64) / 10.0)))


class Similarity:
    """BERT-based sentence similarity (reference `Similarity`,
    tools.py:53-103: pooled layer-11 output summed over tokens,
    max-normalized cosine). Re-implemented over HuggingFace transformers
    (torch CPU) instead of bert4keras.

    Requires local BERT weights (`model_path`) — this environment has no
    network egress, so construction raises a clear error if the weights
    are not available locally. Use `UnigramSimilarity` as an offline
    fallback."""

    def __init__(self, model_path: str = "bert-base-uncased",
                 layer: int = 11, max_len: int = 32):
        import torch  # noqa: F401
        from transformers import AutoModel, AutoTokenizer

        # local_files_only: no network egress here — fail fast to the
        # UnigramSimilarity fallback instead of HF's retry loop
        self.tokenizer = AutoTokenizer.from_pretrained(
            model_path, local_files_only=True)
        self.model = AutoModel.from_pretrained(
            model_path, output_hidden_states=True, local_files_only=True)
        self.model.eval()
        self.layer = layer
        self.max_len = max_len

    def _embed(self, sents: Sequence[str]) -> np.ndarray:
        import torch

        enc = self.tokenizer(
            [_remove_tags(s) for s in sents], padding="max_length",
            truncation=True, max_length=self.max_len, return_tensors="pt")
        with torch.no_grad():
            out = self.model(**enc)
        # hidden_states[self.layer+1] ~ bert4keras 'Encoder-11-FeedForward-Norm'
        h = out.hidden_states[self.layer + 1].numpy()
        return np.sum(h, axis=1)

    def compute_score(self, real: Sequence[str], predicted: Sequence[str]) -> List[float]:
        v1 = self._embed(real)
        v2 = self._embed(predicted)
        # max-normalize per feature (reference tools.py:90-91 uses
        # sklearn normalize(axis=0, norm='max'))
        v1 = v1 / np.maximum(np.max(np.abs(v1), axis=0, keepdims=True), 1e-12)
        v2 = v2 / np.maximum(np.max(np.abs(v2), axis=0, keepdims=True), 1e-12)
        dot = np.sum(v1 * v2, axis=1)
        na = np.sqrt(np.sum(v1 * v1, axis=1))
        nb = np.sqrt(np.sum(v2 * v2, axis=1))
        return (dot / np.maximum(na * nb, 1e-12)).tolist()


class UnigramSimilarity:
    """Network-free fallback similarity: cosine over bag-of-words counts.
    Not a reference metric — provided so SNR sweeps can report a semantic
    proxy in fully offline environments."""

    def compute_score(self, real: Sequence[str], predicted: Sequence[str]) -> List[float]:
        out = []
        for a, b in zip(real, predicted):
            ta, tb = a.split(), b.split()
            vocab = set(ta) | set(tb)
            va = np.array([ta.count(w) for w in vocab], np.float64)
            vb = np.array([tb.count(w) for w in vocab], np.float64)
            denom = np.linalg.norm(va) * np.linalg.norm(vb)
            out.append(float(va @ vb / denom) if denom > 0 else 0.0)
        return out
