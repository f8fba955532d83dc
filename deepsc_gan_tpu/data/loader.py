"""Data loading: pickle token lists -> padded int32 batches.

Reproduces the semantics of the reference loader
(`DeepSC-GAN/dataset/dataloader.py:5-23`): unpickle token-id lists, pad post
to length 31, pair each sentence with itself (the task is an autoencoder —
target == input), shuffle, batch 64, prefetch — but as a pure NumPy
iterator that feeds device arrays (no tf.data). Batches are
fixed-shape (drop_remainder) so every training step hits the same XLA
executable.
"""

from __future__ import annotations

import pickle
from typing import Iterator, List, Sequence, Tuple

import numpy as np


def pad_sequences(
    seqs: Sequence[Sequence[int]], maxlen: int = 31, pad_value: int = 0
) -> np.ndarray:
    """Post-pad (and post-truncate) to (N, maxlen) int32 — the semantics of
    keras `pad_sequences(..., padding='post')` used at dataloader.py:11."""
    out = np.full((len(seqs), maxlen), pad_value, dtype=np.int32)
    for i, s in enumerate(seqs):
        trunc = list(s)[:maxlen]
        out[i, : len(trunc)] = trunc
    return out


class Dataset:
    """Shuffled, fixed-shape batch iterator over padded sentences."""

    def __init__(
        self,
        data: np.ndarray,
        batch_size: int = 64,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
    ):
        assert data.ndim == 2
        self.data = np.asarray(data, dtype=np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle stream as a pure function of (seed, epoch),
        so epoch E's batch order is identical whether reached by
        continuous training or by `cli train --resume` — the exact-resume
        contract (tests/test_cli.py)."""
        self._rng = np.random.default_rng((self.seed, epoch))

    def __len__(self) -> int:
        n = len(self.data) // self.batch_size
        if not self.drop_remainder and len(self.data) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self.data))
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = len(self.data) - (len(self.data) % self.batch_size
                                 if self.drop_remainder else 0)
        for i in range(0, stop, self.batch_size):
            batch = self.data[idx[i : i + self.batch_size]]
            # target == input: the system is an autoencoder (dataloader.py:12)
            yield batch, batch


def load_token_lists(path: str, length: int = -1) -> List[List[int]]:
    with open(path, "rb") as f:
        raw = pickle.load(f)
    return raw if length == -1 else raw[:length]


def return_dataset(
    args, path: str, length: int = -1, shuffle: bool = True, seed: int = 0
) -> Dataset:
    """Analogue of the reference `return_dataset` (dataloader.py:5-17).
    `args` is any object with `.bs` and `.seq_len` (our Config)."""
    raw = load_token_lists(path, length)
    data = pad_sequences(raw, maxlen=getattr(args, "seq_len", 31))
    return Dataset(data, batch_size=args.bs, shuffle=shuffle, seed=seed)


def return_loader(args) -> Tuple[Dataset, Dataset]:
    """Analogue of the reference `return_loader` (dataloader.py:19-23)."""
    train = return_dataset(args, args.train_save_path)
    test = return_dataset(args, args.test_save_path, shuffle=False)
    return train, test


def stacked_batches(ds, k: int) -> Iterator[np.ndarray]:
    """Infinite iterator of (k, B, L) input stacks for the multi-step scan
    train path (`train.steps.make_train_multi_step`), buffering across
    epoch boundaries so no batch is dropped when len(ds) % k != 0."""
    buf: List[np.ndarray] = []
    while True:
        for inp, _ in ds:
            buf.append(inp)
            if len(buf) == k:
                yield np.stack(buf)
                buf = []


def synthetic_dataset(
    n: int = 1024,
    seq_len: int = 31,
    vocab_size: int = 22234,
    batch_size: int = 64,
    seed: int = 0,
    min_len: int = 7,
    max_len: int = 31,
) -> Dataset:
    """Synthetic sentences with the reference's shape statistics
    (<START> w1..wk <END> <PAD>*, lengths 7-31) for tests and benchmarks
    when the Europarl pickles are absent."""
    rng = np.random.default_rng(seed)
    data = np.zeros((n, seq_len), dtype=np.int32)
    lens = rng.integers(min_len, max_len + 1, size=n)
    for i, L in enumerate(lens):
        L = int(min(L, seq_len))
        words = rng.integers(6, vocab_size, size=L - 2)
        data[i, 0] = 1              # <START>
        data[i, 1 : L - 1] = words
        data[i, L - 1] = 2          # <END>
    return Dataset(data, batch_size=batch_size, seed=seed)
