"""Metrics and evaluator plumbing."""

import numpy as np

from deepsc_gan_tpu.evaluate.evaluator import load_result_table, save_result_table
from deepsc_gan_tpu.evaluate.metrics import (
    BleuScore,
    SNR_to_noise,
    UnigramSimilarity,
)


def test_bleu_perfect_and_zero():
    bleu = BleuScore(1, 0, 0, 0)
    s = bleu.compute_score(["the cat sat here today"],
                           ["the cat sat here today"])
    assert np.isclose(s[0], 1.0)
    s2 = bleu.compute_score(["aa bb cc dd ee"], ["xx yy zz ww vv"])
    assert s2[0] < 0.1


def test_bleu_strips_tags():
    bleu = BleuScore(1, 0, 0, 0)
    s = bleu.compute_score(["<x>the</x> cat sat on it"],
                           ["the cat sat on it"])
    assert np.isclose(s[0], 1.0)


def test_bleu_partial_order():
    bleu = BleuScore(1, 0, 0, 0)
    good = bleu.compute_score(["a b c d e"], ["a b c d f"])[0]
    bad = bleu.compute_score(["a b c d e"], ["a x y z f"])[0]
    assert good > bad


def test_snr_to_noise_reference_values():
    assert np.isclose(SNR_to_noise(0), 1.0)
    assert np.isclose(SNR_to_noise(6), 1 / np.sqrt(10 ** 0.6))


def test_unigram_similarity():
    sim = UnigramSimilarity()
    s = sim.compute_score(["the cat", "a b"], ["the cat", "c d"])
    assert np.isclose(s[0], 1.0) and s[1] == 0.0


def test_make_scorers_offline_fallback():
    # no local BERT weights in this environment: "both" must fail fast to
    # the unigram fallback (local_files_only — no network retry loop) and
    # still return two working scorers
    from deepsc_gan_tpu.evaluate.evaluator import make_scorers

    scorers = make_scorers("both")
    assert [name for name, _ in scorers] == ["bleu", "similarity"]
    s = scorers[1][1].compute_score(["the cat sat"], ["the cat sat"])
    assert np.isclose(s[0], 1.0)


def test_result_table_round_trip(tmp_path):
    table = [[0.0, 0.5], [3.0, 0.7]]
    path = str(tmp_path / "log" / "test.pkl")
    save_result_table(table, path)
    assert load_result_table(path) == table
