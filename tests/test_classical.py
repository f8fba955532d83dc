"""Classical Huffman+Turbo baseline (deepsc_gan_tpu.baselines).

The reference ships this capability as MATLAB artifacts with no code
(SURVEY.md §2.36); these tests pin the from-scratch implementation:
Huffman optimality/round-trip, RSC trellis correctness, turbo coding
gain, QAM modem round-trip and LLR signs, and the end-to-end pipeline.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from deepsc_gan_tpu.baselines.huffman import HuffmanCodec
from deepsc_gan_tpu.baselines.modem import QamModem
from deepsc_gan_tpu.baselines.turbo import TurboCodec, rsc_encode

SENTS = [
    "the house rose and observed a minute s silence",
    "this is all in accordance with the principles",
    "the principles that we have always upheld",
    "thank you i shall do so gladly",
]


def test_huffman_roundtrip_and_prefix_free():
    words = [s.split() for s in SENTS]
    h = HuffmanCodec(words)
    for w in words:
        bits = h.encode(w)
        assert h.decode(bits) == list(w)
    codes = list(h.code.values())
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                k = min(len(a), len(b))
                assert a[:k] != b[:k], "prefix violation"


def test_huffman_near_entropy():
    rng = np.random.default_rng(0)
    # Zipf-ish frequencies over 50 symbols
    vocab = [f"w{i}" for i in range(50)]
    p = 1.0 / np.arange(1, 51)
    p /= p.sum()
    stream = rng.choice(vocab, size=20000, p=p)
    h = HuffmanCodec([stream])
    avg_len = np.mean([len(h.code[w]) for w in stream])
    entropy = -(p * np.log2(p)).sum()
    assert entropy <= avg_len < entropy + 1.0  # Huffman optimality bound


def test_huffman_word_lengths_artifact_layout():
    words = [s.split() for s in SENTS]
    h = HuffmanCodec(words)
    lens = h.word_lengths(SENTS[0].split())
    # matches the reference artifact layout: int32 per-word codeword
    # lengths (common/decoded-text/huffman_word_length.pkl)
    assert lens.dtype == np.int32
    assert (lens == [len(h.code[w]) for w in SENTS[0].split()]).all()


def test_rsc_encode_hand_trellis():
    # RSC(7,5): state (s1,s2); a = u^s1^s2; p = a^s2; state <- (a,s1)
    u = np.array([1, 0, 1, 1, 0], dtype=np.uint8)
    s1 = s2 = 0
    expect = []
    for b in u:
        a = b ^ s1 ^ s2
        expect.append(a ^ s2)
        s1, s2 = a, s1
    assert (rsc_encode(u) == expect).all()
    # batched shape
    ub = np.stack([u, 1 - u])
    assert rsc_encode(ub).shape == (2, 5)


def test_turbo_noiseless_exact():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 700, dtype=np.uint8)
    tc = TurboCodec(block_k=256, iters=4)
    sym, n = tc.encode(bits)
    llr = 50.0 * sym  # near-certain channel
    assert (tc.decode(llr, n) == bits).all()


def test_turbo_coding_gain_over_uncoded():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 4096, dtype=np.uint8)
    tc = TurboCodec(block_k=512, iters=6)
    sym, n = tc.encode(bits)
    snr_db = 0.0  # Es/N0 where uncoded BPSK has ~7.9% BER
    llr = tc.awgn_llr(sym, snr_db, jax.random.PRNGKey(3))
    coded_ber = (tc.decode(llr, n) != bits).mean()
    sigma = 1.0 / np.sqrt(10.0 ** (snr_db / 10.0))
    y = (1.0 - 2.0 * bits) + sigma * rng.standard_normal(len(bits))
    uncoded_ber = ((y < 0).astype(np.uint8) != bits).mean()
    assert uncoded_ber > 0.05
    assert coded_ber < uncoded_ber / 10


def test_turbo_attack_devastates():
    # worst-case perturbation at PNR=10dB collapses the coded channel —
    # the reference's Turbo+FGM.pkl conclusion
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 2048, dtype=np.uint8)
    tc = TurboCodec(block_k=512, iters=4)
    sym, n = tc.encode(bits)
    llr = tc.awgn_llr(sym, 6.0, jax.random.PRNGKey(5), attack_pnr_db=10.0)
    attacked_ber = (tc.decode(llr, n) != bits).mean()
    assert attacked_ber > 0.2


@pytest.mark.parametrize("m", [2, 4, 6])
def test_qam_roundtrip_and_energy(m):
    rng = np.random.default_rng(m)
    bits = rng.integers(0, 2, 1200, dtype=np.uint8)
    q = QamModem(m)
    y = q.modulate(bits)
    # unit average energy (exact for full Gray sweep, close for random)
    full = q.modulate(np.array(
        [(i >> b) & 1 for i in range(1 << m) for b in range(m)][::-1]))
    assert abs(np.mean(np.abs(full) ** 2) - 1.0) < 1e-6
    hard = (q.llr(y, 1e-3) < 0).astype(np.uint8)[: len(bits)]
    assert (hard == bits).all()


def test_end_to_end_sentence_pipeline():
    words = [s.split() for s in SENTS]
    h = HuffmanCodec(words)
    enc = [h.encode(w) for w in words]
    k = 128
    assert max(len(b) for b in enc) <= k
    flat = np.zeros((len(enc), k), dtype=np.uint8)
    for i, b in enumerate(enc):
        flat[i, : len(b)] = b
    tc = TurboCodec(block_k=k, iters=4)
    sym, n = tc.encode(flat.ravel())
    coded = (sym < 0).astype(np.uint8)
    q = QamModem(4)
    tx = q.modulate(coded)
    sigma = 1.0 / np.sqrt(10.0 ** (14.0 / 10.0))
    rng = np.random.default_rng(7)
    noise = sigma / np.sqrt(2) * (rng.standard_normal(len(tx))
                                  + 1j * rng.standard_normal(len(tx)))
    llr = q.llr(tx + noise, sigma)[: coded.size].reshape(coded.shape)
    dec = tc.decode(llr, n).reshape(len(enc), k)
    for i, w in enumerate(words):
        assert h.decode(dec[i, : len(enc[i])]) == list(w)


def test_uncoded_pipeline_gradual_curve():
    """coding="none" (the calibration finding's closest match to the
    reference log.pkl shape): runs end-to-end, monotone-ish clean BLEU,
    high-SNR near-perfect, and a WIDER transition than turbo (threshold
    codes cliff; uncoded degrades per-word)."""
    from deepsc_gan_tpu.baselines.pipeline import classical_sweep

    sents = ["the cat sat on the mat", "a dog ran fast today",
             "the house rose and observed silence",
             "this is all in accordance with the principles"] * 10
    rows = classical_sweep(sents, [0.0, 9.0, 18.0], mod_bits=4,
                           coding="none", verbose=False,
                           include_attacked=False)
    clean = [r[2] for r in rows]
    assert clean[2] > 0.95          # high SNR: near-perfect
    assert clean[0] < clean[2]      # degrades with noise
    # uncoded at mid SNR sits strictly BETWEEN floor and ceiling — the
    # gradual-transition signature (turbo at the same point is ~0 or ~1)
    assert 0.05 < clean[1] < 0.95
