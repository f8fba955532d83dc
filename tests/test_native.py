"""Native text pipeline: byte-parity with the pure-Python reference path
(which itself is tested against the reference's regex semantics), plus a
randomized differential test."""

import random
import string

import numpy as np
import pytest

from deepsc_gan_tpu import native
from deepsc_gan_tpu.data.loader import pad_sequences as py_pad
from deepsc_gan_tpu.data.preprocess import normalize_string as py_norm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

CASES = [
    "Hello, World!",
    "<P>Tagged</P> text.",
    "café résumé naïve Müller",
    "nums 123 stay out",
    "",
    "   ",
    "####",
    "a.b",
    "a..b!c?d",
    ".leading",
    "trailing.",
    "un<closed tag",
    "<a href='x.y'>link</a> done",
    "tabs\tand\nnewlines",
    "MiXeD CaSe",
    "ümlaut at start",
    "dash-joined words",
    "it's apostrophes",
    "resumption of the session <SPEAKER ID=1> I declare...",
]


@pytest.mark.parametrize("s", CASES)
def test_normalize_parity(s):
    assert native.normalize_string(s) == py_norm(s), repr(s)


def test_normalize_batch_parity():
    got = native.normalize_lines(CASES)
    want = [py_norm(s) for s in CASES]
    assert got == want


def test_normalize_fuzz():
    rng = random.Random(0)
    alphabet = (string.ascii_letters + string.digits + " .!?,;<>()'\"-"
                + "éàüßñç\t")
    for _ in range(300):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 80)))
        assert native.normalize_string(s) == py_norm(s), repr(s)


def test_pad_sequences_parity():
    seqs = [[1, 2], [3, 4, 5, 6, 7], [], [9] * 40]
    got = native.pad_sequences(seqs, maxlen=31)
    want = py_pad(seqs, maxlen=31)
    np.testing.assert_array_equal(got, want)


def test_native_bleu_matches_nltk_fuzz():
    """Native BLEU == NLTK sentence_bleu across random pairs, weights, and
    degenerate cases (empty hyp, no overlap, identical, short-for-ngram)."""
    import warnings

    import numpy as np
    from nltk.translate.bleu_score import sentence_bleu

    from deepsc_gan_tpu import native as nat

    if not nat.available():
        import pytest
        pytest.skip("no native compiler")

    rng = np.random.default_rng(0)
    weight_sets = [(1.0, 0.0, 0.0, 0.0), (0.25, 0.25, 0.25, 0.25),
                   (0.5, 0.5, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0)]
    cases = []
    for _ in range(120):
        rlen = int(rng.integers(1, 32))
        hlen = int(rng.integers(0, 32))
        vocab = int(rng.integers(3, 30))
        ref = rng.integers(0, vocab, rlen).tolist()
        # mix: some hyps share tokens with ref, some don't
        if rng.random() < 0.5 and hlen:
            hyp = [ref[int(rng.integers(0, rlen))] for _ in range(hlen)]
        else:
            hyp = rng.integers(0, vocab, hlen).tolist()
        cases.append((ref, hyp))
    cases += [([1, 2, 3], [1, 2, 3]), ([1, 2, 3], []), ([5], [7]),
              ([1, 1, 1, 1], [1, 1]), ([1, 2], [1, 2, 3, 4, 5])]

    for w in weight_sets:
        refs = [c[0] for c in cases]
        hyps = [c[1] for c in cases]
        got = nat.bleu_batch(refs, hyps, w)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = [sentence_bleu([[str(t) for t in r]],
                                  [str(t) for t in h], weights=w)
                    for r, h in cases]
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"weights={w}")


def test_bleuscore_native_path_matches_nltk_path():
    from deepsc_gan_tpu.evaluate.metrics import BleuScore

    real = ["the cat sat on the mat", "hello world", "a b c d"]
    pred = ["the cat sat on mat", "hello there world", "a b x d"]
    fast = BleuScore(1, 0, 0, 0, native=True).compute_score(real, pred)
    slow = BleuScore(1, 0, 0, 0, native=False).compute_score(real, pred)
    import numpy as np
    np.testing.assert_allclose(fast, slow, rtol=1e-12)
