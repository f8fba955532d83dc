"""Vocabulary and id<->text conversion.

Reproduces the semantics of the reference's vocab JSON layout
(`DeepSC-GAN/dataset/preprocess_text.py:88-105,156-167`: a dict
`{"token_to_idx": {...}}` with specials `<PAD>=0,<START>=1,<END>=2,<UNK>=3`)
and of `SeqtoText` (`DeepSC-GAN/utlis/tools.py:10-27`: join words until the
first `<END>`).
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Sequence

SPECIAL_TOKENS = {
    "<PAD>": 0,
    "<START>": 1,
    "<END>": 2,
    "<UNK>": 3,
}


class Vocab:
    def __init__(self, token_to_idx: Dict[str, int]):
        self.token_to_idx = dict(token_to_idx)
        self.idx_to_token = {i: t for t, i in self.token_to_idx.items()}

    # --- constructors -----------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path) as f:
            blob = json.load(f)
        # accept both the reference wrapper {"token_to_idx": {...}} and a
        # bare mapping
        t2i = blob.get("token_to_idx", blob) if isinstance(blob, dict) else blob
        return cls(t2i)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"token_to_idx": self.token_to_idx}, f)

    @classmethod
    def build(
        cls,
        sequences: Iterable[Sequence[str]],
        min_token_count: int = 1,
    ) -> "Vocab":
        """Build a vocab from pre-tokenized sentences: specials first, then
        all surviving tokens in sorted order (reference
        `build_vocab`, preprocess_text.py:88-105)."""
        counts: Dict[str, int] = {}
        for toks in sequences:
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
        token_to_idx = dict(SPECIAL_TOKENS)
        for token, count in sorted(counts.items()):
            if count >= min_token_count and token not in token_to_idx:
                token_to_idx[token] = len(token_to_idx)
        return cls(token_to_idx)

    # --- protocol ---------------------------------------------------------
    def __len__(self) -> int:
        return len(self.token_to_idx)

    def __contains__(self, token: str) -> bool:
        return token in self.token_to_idx

    def encode(self, tokens: Sequence[str], allow_unk: bool = True) -> List[int]:
        """Token strings -> ids (reference `encode`, preprocess_text.py:108-117).
        Note the reference's encoding loop uses direct indexing (`:174`),
        i.e. effectively allow_unk=False; we default to UNK-mapping since
        that is the safer library behavior."""
        out = []
        for t in tokens:
            if t not in self.token_to_idx:
                if not allow_unk:
                    raise KeyError(f"Token {t!r} not in vocab")
                t = "<UNK>"
            out.append(self.token_to_idx[t])
        return out

    def decode(
        self, ids: Sequence[int], stop_at_end: bool = True, join: bool = False
    ):
        """Ids -> tokens, optionally stopping at <END>
        (reference `decode`, preprocess_text.py:120-129)."""
        toks: List[str] = []
        for i in ids:
            toks.append(self.idx_to_token.get(int(i), "<UNK>"))
            if stop_at_end and toks[-1] == "<END>":
                break
        return " ".join(toks) if join else toks


class SeqToText:
    """Id-sequence -> sentence string, dropping everything from the first
    `end_idx` on (reference `SeqtoText`, utlis/tools.py:10-27). Unknown ids
    render as the literal string 'None' like the reference's
    `dict.get`-then-join behavior — kept for metric parity."""

    def __init__(self, vocab: Vocab, end_idx: int = 2):
        self.reverse_word_map = vocab.idx_to_token
        self.end_idx = end_idx

    def sequence_to_text(self, list_of_indices: Sequence[int]) -> str:
        words = []
        for idx in list_of_indices:
            idx = int(idx)
            if idx == self.end_idx:
                break
            words.append(str(self.reverse_word_map.get(idx)))
        return " ".join(words)
