"""Data layer: normalization, tokenize/vocab round-trip, padding, loader.
(Test plan per SURVEY.md §4 — the reference has no tests; the committed
vocab.json/test_data.pkl are the golden artifacts when available.)"""

import os

import numpy as np
import pytest

from deepsc_gan_tpu.data.loader import Dataset, pad_sequences, synthetic_dataset
from deepsc_gan_tpu.data.preprocess import cutted_data, normalize_string, tokenize
from deepsc_gan_tpu.data.vocab import SPECIAL_TOKENS, SeqToText, Vocab

REF_VOCAB = "/root/reference/DeepSC-GAN/data/txt/vocab.json"


def test_normalize_string():
    # mirrors reference preprocess_text.py:28-39 semantics
    assert normalize_string("Hello, World!") == "hello world !"
    assert normalize_string("<P>Tagged</P> text.") == "tagged text ."
    assert normalize_string("café résumé") == "cafe resume"
    assert normalize_string("nums 123 stay out") == "nums stay out"


def test_cutted_data_bounds():
    short = "a b c d"          # 4 words — excluded (strict >)
    ok = "a b c d e"           # 5 words — included
    long = " ".join(["w"] * 30)  # 30 words — excluded (strict <)
    assert cutted_data([short, ok, long]) == [ok]


def test_tokenize_punct():
    toks = tokenize("hello , world .", punct_to_keep=[";", ","],
                    punct_to_remove=["?", "."])
    assert toks[0] == "<START>" and toks[-1] == "<END>"
    assert "," in toks and "." not in " ".join(toks[1:-1])


def test_vocab_round_trip():
    sents = [["the", "cat"], ["the", "dog", "barks"]]
    v = Vocab.build(sents)
    assert v.token_to_idx["<PAD>"] == 0 and v.token_to_idx["<START>"] == 1
    ids = v.encode(["the", "dog"])
    assert v.decode(ids) == ["the", "dog"]
    assert v.encode(["zebra"]) == [SPECIAL_TOKENS["<UNK>"]]
    with pytest.raises(KeyError):
        v.encode(["zebra"], allow_unk=False)


def test_vocab_sorted_order():
    v = Vocab.build([["b", "a", "c"]])
    assert v.token_to_idx["a"] < v.token_to_idx["b"] < v.token_to_idx["c"]


def test_seq_to_text_stops_at_end():
    v = Vocab.build([["hi", "there"]])
    s2t = SeqToText(v, end_idx=2)
    ids = v.encode(["hi", "there"]) + [2] + v.encode(["hi"])
    assert s2t.sequence_to_text(ids) == "hi there"


def test_pad_sequences():
    out = pad_sequences([[1, 2], [3, 4, 5, 6]], maxlen=3)
    assert out.shape == (2, 3) and out.dtype == np.int32
    assert out[0].tolist() == [1, 2, 0]
    assert out[1].tolist() == [3, 4, 5]  # post-truncate


def test_dataset_fixed_shapes():
    ds = synthetic_dataset(n=70, seq_len=31, vocab_size=100, batch_size=16)
    batches = list(ds)
    assert len(batches) == 4  # drop remainder
    for inp, tar in batches:
        assert inp.shape == (16, 31)
        np.testing.assert_array_equal(inp, tar)  # autoencoder pairing


def test_dataset_shuffle_deterministic():
    data = np.arange(40, dtype=np.int32).reshape(20, 2)
    a = [b[0] for b in Dataset(data, batch_size=4, seed=7)]
    b = [b[0] for b in Dataset(data, batch_size=4, seed=7)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.skipif(not os.path.exists(REF_VOCAB),
                    reason="reference artifacts not mounted")
def test_reference_vocab_golden():
    """The committed reference vocab is the golden output of the
    preprocessing pipeline: check invariants our pipeline guarantees."""
    v = Vocab.load(REF_VOCAB)
    assert len(v) == 22234
    for tok, idx in SPECIAL_TOKENS.items():
        assert v.token_to_idx[tok] == idx
    # sorted-token ordering after the specials (build_vocab semantics)
    items = sorted(v.token_to_idx.items(), key=lambda kv: kv[1])
    non_special = [t for t, i in items if i >= 4]
    assert non_special == sorted(non_special)


def test_preprocess_corpus_end_to_end(tmp_path):
    """Full pipeline on a miniature Europarl-like corpus dir: vocab built
    sorted-after-specials, sentences encoded with <START>/<END>, 90/10
    split, round-trip through the vocab."""
    from deepsc_gan_tpu.data.preprocess import preprocess_corpus

    corpus = tmp_path / "en"
    corpus.mkdir()
    lines = [
        "<CHAPTER ID=1>",
        "Resumption of the session!",
        "I declare resumed the session of the European Parliament.",
        "Please rise, then, for this minute of silence.",
        "Madam President, on a point of order again today.",
        "You have requested a debate on this subject soon.",
        "The vote will take place today at noon instead.",
        "too short",
        "Resumption of the session!",  # duplicate -> deduped
    ]
    (corpus / "a.txt").write_text("\n".join(lines), encoding="utf8")

    vocab, train, test = preprocess_corpus(str(corpus))
    total = len(train) + len(test)
    assert total == 6  # 7 valid minus 1 duplicate
    assert len(train) == round(total * 0.9)
    # every sequence wrapped and decodable
    for seq in train + test:
        assert seq[0] == 1 and seq[-1] == 2
        toks = vocab.decode(seq[1:-1], stop_at_end=False)
        assert all(t not in ("<UNK>",) for t in toks)
    # punct_to_remove drops '.' and '?' from the vocab; '!' survives
    # (the committed reference vocab has '!'=5 and no '.'/'?' —
    # tests/test_golden_reference_data.py pins that side)
    assert "." not in vocab.token_to_idx
    assert "?" not in vocab.token_to_idx
    assert "!" in vocab.token_to_idx
    assert "session" in vocab.token_to_idx
