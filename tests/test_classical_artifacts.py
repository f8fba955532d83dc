"""Tests for the reference classical-artifact decode chain
(scripts/decode_reference_mats.py, VERDICT r3 item 1).

These tests consume the reference's committed binaries directly
(`DeepSC-GAN/common/**` — SURVEY §2.36) and pin the recovered facts:
the exact Huffman chain, the msgOutBytes encoding scheme, and the
artifact-level inconsistency with the published log.pkl curve.
Skipped when the reference tree is not present.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/DeepSC-GAN/common"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not available")


@pytest.fixture(scope="module")
def chain():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import decode_reference_mats as drm

    sents, bitstr, lengths, log, mats = drm.load_artifacts()
    text = "".join(sents)
    code2char = drm.recover_codebook(text, bitstr, lengths)
    return drm, sents, text, code2char, log, mats


def test_chain_a_exact(chain):
    drm, sents, text, code2char, log, mats = chain
    # recover_codebook already asserts: consistency, prefix-freeness,
    # bit-count == sum(lengths), symbol count == char count
    assert len(code2char) == 30
    assert set(code2char.values()) == set(text)
    # the three most frequent chars get the shortest codes (Huffman sanity)
    from collections import Counter
    freq = Counter(text)
    top = [c for c, _ in freq.most_common(3)]
    char2code = {c: k for k, c in code2char.items()}
    assert all(len(char2code[c]) <= 4 for c in top)


def test_chain_b_encoding_recovered(chain):
    drm, sents, text, code2char, log, mats = chain
    pred = drm.predicted_rows(text, code2char)
    # at the highest SNR the committed rows match the predicted value
    # sequence at offset 0 with >90% positional agreement
    v18 = drm.rows_to_vals(mats[18])
    assert float((v18 == pred).mean()) > 0.90
    # and degrade monotonically toward low SNR (allow tiny noise slack)
    matches = [float((drm.rows_to_vals(mats[s]) == pred).mean())
               for s in drm.SNRS]
    assert all(b >= a - 0.02 for a, b in zip(matches, matches[1:]))
    assert matches[0] < 0.10  # -6 dB is near-destroyed


def test_ber_is_uncoded_fading_not_coded_waterfall(chain):
    drm, sents, text, code2char, log, mats = chain
    pred = drm.predicted_rows(text, code2char)
    pred_bits = ((pred[:, None] >> np.arange(8)) & 1).astype(np.uint8)
    bers = {s: float((mats[s] != pred_bits).mean()) for s in drm.SNRS}
    # a coded system above its waterfall would be at BER ~ 0 by 18 dB;
    # the committed bits still show >1% BER there
    assert bers[18] > 0.01
    # BER * SNR_lin roughly constant over 9..18 dB (fading signature)
    prods = [bers[s] * 10 ** (s / 10) for s in (9, 12, 15, 18)]
    assert max(prods) / min(prods) < 2.0


def test_log_pkl_not_reproducible_from_committed_bits(chain):
    drm, sents, text, code2char, log, mats = chain
    from deepsc_gan_tpu.evaluate.metrics import BleuScore

    pred = drm.predicted_rows(text, code2char)
    v18 = drm.rows_to_vals(mats[18])
    _, oracle = drm.decoder_tables(text, code2char, v18)
    dec = "".join(oracle.get(int(x), "#") for x in v18)
    refs, hyps = drm.frame_sentences(dec, sents)
    bleu1 = float(np.mean(BleuScore(1, 0, 0, 0).compute_score(refs, hyps)))
    published = {int(r[0]): float(r[1]) for r in log}[18]
    # even the oracle decoder is >0.4 BLEU below the published value:
    # the committed bits cannot produce log.pkl under any decoder
    assert published > 0.95
    assert bleu1 < published - 0.4


def test_decode_results_committed():
    import json
    path = os.path.join(os.path.dirname(__file__), "..",
                        "results", "classical_decode.json")
    with open(path) as f:
        out = json.load(f)
    assert out["conclusion"]["consistent_with_log"] is False
    assert len(out["per_snr"]) == 9
