"""SNR-sweep evaluator plumbing (decode mocked — the real decoders are
covered in test_decode.py)."""

import numpy as np

from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu
from deepsc_gan_tpu.utils.config import Config


def _vocab(n=20):
    t2i = {"<PAD>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    for i in range(4, n):
        t2i[f"w{i}"] = i
    return Vocab(t2i)


def test_sweep_perfect_decoder_scores_one():
    cfg = Config(vocab_size=20, bs=4, seq_len=8, max_length=7)
    vocab = _vocab()
    rng = np.random.default_rng(0)
    batch = np.zeros((4, 8), np.int32)
    for i in range(4):
        batch[i, 0] = 1
        batch[i, 1:6] = rng.integers(4, 20, 5)
        batch[i, 6] = 2

    def perfect_decode(params, inp, key, pnr_db, n_std):
        return inp  # echoes the input ids

    table = snr_sweep_bleu(perfect_decode, None, [batch], vocab, cfg,
                           snrs=[0, 6])
    assert [row[0] for row in table] == [0.0, 6.0]
    assert all(abs(row[1] - 1.0) < 1e-9 for row in table)


def test_sweep_degraded_decoder_scores_below_one():
    cfg = Config(vocab_size=20, bs=2, seq_len=8, max_length=7)
    vocab = _vocab()
    batch = np.array([[1, 5, 6, 7, 8, 9, 2, 0],
                      [1, 10, 11, 12, 13, 14, 2, 0]], np.int32)

    def noisy_decode(params, inp, key, pnr_db, n_std):
        out = np.array(inp)
        out[:, 2] = 4  # corrupt one word
        return out

    table = snr_sweep_bleu(noisy_decode, None, [batch], vocab, cfg,
                           snrs=[0])
    assert 0.0 < table[0][1] < 1.0


def test_sweep_tuple_decoder_output():
    """GAN decoder returns (ids, noa) — evaluator takes element 0."""
    cfg = Config(vocab_size=20, bs=1, seq_len=6, max_length=5)
    vocab = _vocab()
    batch = np.array([[1, 5, 6, 7, 2, 0]], np.int32)

    def tuple_decode(params, inp, key, pnr_db, n_std, epsilon):
        return inp, None

    table = snr_sweep_bleu(tuple_decode, None, [batch], vocab, cfg,
                           snrs=[3], decode_extra_args=(1.0,))
    assert abs(table[0][1] - 1.0) < 1e-9
