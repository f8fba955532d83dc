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


def test_combined_eval_artifact_loader_compat():
    """results/eval-ours.pkl (scripts/combined_eval_table.py) must be
    indexable exactly like the reference's headline robustness artifact
    (/root/reference/DeepSC-GAN/log/eval-D-GAN-STAR/eval.pkl, SURVEY §6):
    3 groups x 19 SNR rows x 7 columns, row =
    [snr, att_1, clean_1, att_2, clean_2, att_3, clean_3]."""
    import os

    import pytest

    from deepsc_gan_tpu.evaluate.evaluator import load_result_table

    path = os.path.join(os.path.dirname(__file__), "..",
                        "results", "eval-ours.pkl")
    if not os.path.exists(path):
        pytest.skip("artifact not generated (TPU sweep)")
    ours = load_result_table(path)
    a = np.asarray(ours, dtype=np.float64)  # same dtype as the reference
    assert a.shape == (3, 19, 7)
    # SNR column is the 0..18 dB grid in every group (reference bytes)
    for g in range(3):
        assert [row[0] for row in ours[g]] == list(range(19))
    # metric columns are BLEU in [0, 1]
    assert a[:, :, 1:].min() >= 0.0 and a[:, :, 1:].max() <= 1.0
    # the reference-notebook consumer pattern: unzip one (att, clean)
    # pair as two curves per group — attacked should not beat clean
    # on average (the attack hurts)
    for g in range(3):
        att = a[g, :, 1::2]
        clean = a[g, :, 2::2]
        assert att.mean() <= clean.mean() + 1e-6
