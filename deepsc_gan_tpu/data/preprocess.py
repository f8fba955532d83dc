"""Europarl corpus preprocessing.

Re-implements the reference pipeline (`DeepSC-GAN/dataset/preprocess_text.py`)
with identical text semantics — NFD unicode fold, XML-tag strip, spacing out
`!.?`, `[a-zA-Z.!?]`-only filter, lowercasing, 5-29-word length filter,
order-preserving dedupe, sorted vocab with specials, `;`/`,` kept and
`?`/`.` removed at tokenize time, `<START>`/`<END>` wrapping, 90/10 split —
but pure-Python/NumPy (no TF) with a real CLI (the reference hard-codes
Windows notebook paths, preprocess_text.py:133).

The committed reference artifacts (22,234-entry vocab.json, test_data.pkl)
are the golden outputs of this pipeline.
"""

from __future__ import annotations

import argparse
import os
import pickle
import re
import unicodedata
from typing import Iterable, List, Sequence, Tuple

from deepsc_gan_tpu.data.vocab import Vocab

_TAG_RE = re.compile(r"<[^>]*>")
_PUNCT_SPACE_RE = re.compile(r"([!.?])")
_NON_ALPHA_RE = re.compile(r"[^a-zA-Z.!?]+")
_WS_RE = re.compile(r"\s+")

PUNCT_TO_KEEP = [";", ","]
PUNCT_TO_REMOVE = ["?", "."]


def unicode_to_ascii(s: str) -> str:
    # reference: preprocess_text.py:24-26
    return "".join(
        c for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn"
    )


def remove_tags(s: str) -> str:
    # reference uses w3lib.html.remove_tags (preprocess_text.py:32); a plain
    # regex strip of <...> spans matches its behavior on Europarl text
    return _TAG_RE.sub("", s)


def normalize_string(s: str) -> str:
    # reference: preprocess_text.py:28-39
    s = unicode_to_ascii(s)
    s = remove_tags(s)
    s = _PUNCT_SPACE_RE.sub(r" \1", s)
    s = _NON_ALPHA_RE.sub(r" ", s)
    s = _WS_RE.sub(r" ", s)
    return s.lower()


def cutted_data(cleaned: Iterable[str], min_length: int = 4, max_length: int = 30) -> List[str]:
    # reference: preprocess_text.py:41-48 (strictly-between filter)
    out = []
    for line in cleaned:
        n = len(line.split())
        if min_length < n < max_length:
            out.append(" ".join(line.split()))
    return out


def process_file(text_path: str, use_native: bool = True) -> List[str]:
    # reference: preprocess_text.py:54-62. The native C++ pipeline
    # (deepsc_gan_tpu/native) fuses the 5 regex passes into one; it is
    # byte-parity-tested against normalize_string and used when a
    # toolchain is available.
    with open(text_path, "r", encoding="utf8") as f:
        raw = f.read()
    sentences = raw.strip().split("\n")
    if use_native:
        from deepsc_gan_tpu import native
        if native.available():
            return cutted_data(native.normalize_lines(sentences))
    return cutted_data([normalize_string(s) for s in sentences])


def tokenize(
    s: str,
    delim: str = " ",
    add_start_token: bool = True,
    add_end_token: bool = True,
    punct_to_keep: Sequence[str] = None,
    punct_to_remove: Sequence[str] = None,
) -> List[str]:
    # reference: preprocess_text.py:65-85
    if punct_to_keep is not None:
        for p in punct_to_keep:
            s = s.replace(p, f"{delim}{p}")
    if punct_to_remove is not None:
        for p in punct_to_remove:
            s = s.replace(p, "")
    tokens = s.split(delim)
    if add_start_token:
        tokens.insert(0, "<START>")
    if add_end_token:
        tokens.append("<END>")
    return tokens


def dedupe(sentences: Iterable[str]) -> List[str]:
    # reference dedupes via dict insertion order (preprocess_text.py:148-153)
    return list(dict.fromkeys(sentences))


def preprocess_corpus(
    input_dir: str,
) -> Tuple[Vocab, List[List[int]], List[List[int]]]:
    """Full pipeline: raw .txt dir -> (vocab, train token lists, test token lists)."""
    sentences: List[str] = []
    for fn in sorted(os.listdir(input_dir)):
        if not fn.endswith(".txt"):
            continue
        sentences += process_file(os.path.join(input_dir, fn))
    sentences = dedupe(sentences)

    tokenized = [
        tokenize(s, add_start_token=False, add_end_token=False,
                 punct_to_keep=PUNCT_TO_KEEP, punct_to_remove=PUNCT_TO_REMOVE)
        for s in sentences
    ]
    vocab = Vocab.build(tokenized)

    results = []
    for s in sentences:
        words = tokenize(s, punct_to_keep=PUNCT_TO_KEEP,
                         punct_to_remove=PUNCT_TO_REMOVE)
        results.append([vocab.token_to_idx[w] for w in words])

    split = round(len(results) * 0.9)  # reference: preprocess_text.py:180-181
    return vocab, results[:split], results[split:]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-data-dir", default="data/txt/en")
    parser.add_argument("--output-train-dir", default="data/txt/train_data.pkl")
    parser.add_argument("--output-test-dir", default="data/txt/test_data.pkl")
    parser.add_argument("--output-vocab", default="data/txt/vocab.json")
    args = parser.parse_args(argv)

    vocab, train_data, test_data = preprocess_corpus(args.input_data_dir)
    print(f"Number of sentences: {len(train_data) + len(test_data)}")
    print(f"Number of words in Vocab: {len(vocab)}")

    if args.output_vocab:
        os.makedirs(os.path.dirname(args.output_vocab) or ".", exist_ok=True)
        vocab.save(args.output_vocab)
    with open(args.output_train_dir, "wb") as f:
        pickle.dump(train_data, f)
    with open(args.output_test_dir, "wb") as f:
        pickle.dump(test_data, f)
    print(f"Saved: {args.output_vocab}, {args.output_train_dir}, {args.output_test_dir}")


if __name__ == "__main__":
    main()
