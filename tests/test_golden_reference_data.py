"""Golden cross-artifact consistency tests over the reference's committed
corpus blobs (VERDICT r3 item 8).

The reference commits `data/txt/vocab.json` (22,234 entries),
`data/txt/test_data.pkl` (7,347 token-id lists) and
`common/data/data.pkl` (1,000 raw sentences for the classical baseline).
These tests pin every structural fact the blobs actually support —
including the finding that the classical sentences were preprocessed with
a DIFFERENT (upstream-DeepSC-style, periods kept) pipeline and are
text-disjoint from test_data.pkl, so membership is NOT the invariant;
vocabulary coverage is.
"""

import os
import pickle

import pytest

REF_DATA = "/root/reference/DeepSC-GAN/data/txt"
REF_COMMON = "/root/reference/DeepSC-GAN/common/data/data.pkl"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available")


@pytest.fixture(scope="module")
def blobs():
    from deepsc_gan_tpu.data.vocab import Vocab
    vocab = Vocab.load(os.path.join(REF_DATA, "vocab.json"))
    with open(os.path.join(REF_DATA, "test_data.pkl"), "rb") as f:
        test = pickle.load(f)
    with open(REF_COMMON, "rb") as f:
        common = pickle.load(f)
    return vocab, test, common


def test_vocab_golden_structure(blobs):
    vocab, _, _ = blobs
    assert len(vocab) == 22234
    items = sorted(vocab.token_to_idx.items(), key=lambda kv: kv[1])
    toks = [t for t, _ in items]
    # specials in reference order, then the two loss-quirk tokens
    assert toks[:6] == ["<PAD>", "<START>", "<END>", "<UNK>", "", "!"]
    # build_vocab sorts everything after the specials
    # (reference preprocess_text.py:88-105; repo Vocab.build mirrors it)
    assert toks[4:] == sorted(toks[4:])
    # normalize_string keeps only [a-zA-Z.!?] and punct_to_remove drops
    # '?' '.', so no sentence punctuation survives into the vocab
    for p in (".", "?", ","):
        assert p not in vocab.token_to_idx


def test_test_data_golden_structure(blobs):
    vocab, test, _ = blobs
    assert len(test) == 7347
    assert len(set(map(tuple, test))) == 7347  # deduped
    lens = sorted(len(t) for t in test)
    assert lens[0] == 7 and lens[-1] == 31
    for t in test:
        assert t[0] == 1 and t[-1] == 2  # <START> ... <END>
        assert max(t) < len(vocab)
    # the trailing-'' quirk: most sentences end [..., 4, 2] — the reason
    # the reference loss INTENDED to mask id 4 (quirk Q2)
    with_empty = sum(1 for t in test if t[-2] == 4)
    assert with_empty == 6063


def test_classical_sentences_covered_by_vocab_but_disjoint(blobs):
    """The 1,000 classical-baseline sentences are fully covered by the
    committed vocab modulo punctuation — but are NOT members of
    test_data.pkl: they were preprocessed with the upstream-DeepSC-style
    pipeline that keeps ' . ' tokens. Pinning both facts documents the
    provenance split between `data/txt/` and `common/`."""
    vocab, test, common = blobs

    missing = {w for s in common for w in s.split()
               if w not in vocab.token_to_idx}
    # only punctuation-bearing tokens are outside the vocab
    assert missing <= {".", "?", ".e", ".m"}, missing

    # decode test ids the SeqtoText way and compare as text
    i2t = vocab.idx_to_token

    def dec(ids):
        words = []
        for i in ids:
            t = i2t[i]
            if t == "<END>":
                break
            if t in ("<START>", "<PAD>"):
                continue
            words.append(t)
        return " ".join(w for w in words if w)

    test_texts = {dec(t) for t in test}
    strip = {".", "?"}
    hits = sum(
        1 for s in common
        if " ".join(w for w in s.split() if w not in strip) in test_texts)
    # essentially disjoint (exactly one sentence coincides)
    assert hits <= 2
