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
