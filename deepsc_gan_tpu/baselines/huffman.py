"""Word-level Huffman source coding.

Counterpart of the reference's MATLAB Huffman stage: the committed
artifact `common/decoded-text/huffman_word_length.pkl` is an int32 array
of per-word Huffman codeword lengths, i.e. the reference source-coded the
corpus at WORD granularity (SURVEY.md §2.36). This module builds the
canonical Huffman code from corpus word frequencies and encodes/decodes
word sequences to/from numpy bit arrays.

Decoding walks the prefix tree bit-by-bit; after channel errors the walk
desynchronizes — that is the classical "cliff effect" the DeepSC line of
work contrasts itself against, so it is preserved, not hidden.
"""

from __future__ import annotations

import heapq
from collections import Counter
from typing import Iterable, Sequence

import numpy as np


class HuffmanCodec:
    """Canonical word-level Huffman code built from corpus frequencies."""

    def __init__(self, sentences: Iterable[Sequence[str]]):
        freqs = Counter()
        for words in sentences:
            freqs.update(words)
        if len(freqs) < 2:
            raise ValueError("need at least two distinct words")
        # heap of (freq, tiebreak, node); node = word | (left, right)
        heap = [(f, i, w) for i, (w, f) in enumerate(sorted(freqs.items()))]
        heapq.heapify(heap)
        n = len(heap)
        while len(heap) > 1:
            f1, _, a = heapq.heappop(heap)
            f2, _, b = heapq.heappop(heap)
            n += 1
            heapq.heappush(heap, (f1 + f2, n, (a, b)))
        self._root = heap[0][2]
        self._code: dict[str, tuple[int, ...]] = {}
        stack = [(self._root, ())]
        while stack:
            node, prefix = stack.pop()
            if isinstance(node, tuple):
                stack.append((node[0], prefix + (0,)))
                stack.append((node[1], prefix + (1,)))
            else:
                self._code[node] = prefix

    @property
    def code(self) -> dict[str, tuple[int, ...]]:
        return self._code

    def word_lengths(self, words: Sequence[str]) -> np.ndarray:
        """Per-word codeword lengths (the reference's committed artifact
        `huffman_word_length.pkl` layout)."""
        return np.array([len(self._code[w]) for w in words], dtype=np.int32)

    def encode(self, words: Sequence[str]) -> np.ndarray:
        """-> uint8 bit array."""
        bits: list[int] = []
        for w in words:
            bits.extend(self._code[w])
        return np.array(bits, dtype=np.uint8)

    def decode(self, bits: np.ndarray, max_words: int | None = None
               ) -> list[str]:
        """Prefix-tree walk. Trailing partial codewords are dropped;
        corrupted bits desynchronize the walk (cliff effect, by design)."""
        out: list[str] = []
        node = self._root
        for b in np.asarray(bits, dtype=np.uint8):
            node = node[int(b)]
            if not isinstance(node, tuple):
                out.append(node)
                node = self._root
                if max_words is not None and len(out) >= max_words:
                    break
        return out
