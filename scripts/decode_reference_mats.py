"""Decode the reference's committed classical-baseline artifacts and close
the parity loop (VERDICT r3 item 1).

The reference ships four binary artifact families for its Huffman+Turbo
classical baseline (`DeepSC-GAN/common/**`, SURVEY §2.36 — no MATLAB code
was committed, only outputs):

  * `common/data/data.pkl`            — 1,000 raw test sentences (101,157 chars)
  * `common/decoded-text/data.mat`    — `string (422459,)` of '0'/'1' chars
  * `common/decoded-text/huffman_word_length.pkl` — 101,157 int32 lengths
  * `common/output/SNR={-6..18}.mat`  — `msgOutBytes (1012, 8)` uint8 per SNR
  * `common/log/log.pkl`              — the published 7-point curve
                                        `[[snr, col1, col2], ...]`

This script reverse-engineers the full chain from the bits alone:

CHAIN A (exact, lossless) — the Huffman encoding:
  `data.mat` is the character-level Huffman bitstream of the 1,000
  sentences concatenated (NOT word-level: 101,157 "word" lengths ==
  total character count; 422,459 bits == sum of lengths). Pairing each
  char with its bit-chunk recovers a CONSISTENT, PREFIX-FREE codebook of
  30 codes (lengths 3..12) over the alphabet ` !.?a-z`. Verified exactly.

CHAIN B (recovered) — what `msgOutBytes` is:
  Each row of `msgOutBytes` is ONE transmitted character of the first
  1,012 chars of the text, stored as `de2bi(v, 8)` (LSB-first bits) where
  `v = bin2dec(huffman_code) mod 256`. The MATLAB `bin2dec` conversion
  DROPS LEADING ZEROS, so distinct codes collide ('a'='0111' and
  ' '='111' both map to 7; 'm'/'t' -> 13; 'u'/'y' -> 2; ...), and codes
  longer than 8 bits ('q','j','x','z','!','?') alias mod 256. The
  positional value-match against the predicted sequence at offset 0 is
  ~93.3% at SNR=18 and degrades smoothly to ~4.6% at -6 dB.

CONCLUSIONS (written to results/classical_decode.json):
  1. The committed decoded bits are from an UNCODED transmission over a
     fading-like channel: measured BER decays ~1/SNR (1.4% at 18 dB),
     orders of magnitude above any turbo-coded AWGN waterfall at high SNR.
  2. `log.pkl` col1 (0.9805 BLEU-1 at 18 dB) CANNOT have been computed
     from these bits: even an ORACLE symbol decoder (each 8-bit value
     mapped to the positionally-most-frequent true char — information no
     real decoder has) tops out far below the published value, because
     the leading-zero-dropping code conversion is lossy by construction.
     This replaces round-3's config-grid argument ("no turbo config
     matches") with an artifact-level proof: the committed .mat outputs
     and the committed log.pkl come from DIFFERENT pipeline runs.
  3. The decoded per-SNR text (committed to
     results/classical_decoded_text.json) is scored with the repo's
     BleuScore under the recovered framing, giving the reproducible
     curve the committed bits actually support.

Run: python scripts/decode_reference_mats.py   (CPU-only, no JAX)
"""

from __future__ import annotations

import json
import os
import pickle
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/DeepSC-GAN/common"
SNRS = [-6, -3, 0, 3, 6, 9, 12, 15, 18]
BLOCK = 1012  # chars per committed msgOutBytes block


def load_artifacts(ref_dir: str = REF):
    import scipy.io as sio

    with open(f"{ref_dir}/data/data.pkl", "rb") as f:
        sents = pickle.load(f)
    bitstr = "".join(sio.loadmat(f"{ref_dir}/decoded-text/data.mat")["string"].ravel())
    with open(f"{ref_dir}/decoded-text/huffman_word_length.pkl", "rb") as f:
        lengths = np.asarray(pickle.load(f))
    with open(f"{ref_dir}/log/log.pkl", "rb") as f:
        log = pickle.load(f)
    mats = {
        snr: sio.loadmat(f"{ref_dir}/output/SNR={snr}.mat")["msgOutBytes"]
        for snr in SNRS
    }
    return sents, bitstr, lengths, log, mats


def recover_codebook(text: str, bitstr: str, lengths: np.ndarray) -> dict:
    """CHAIN A: pair each char with its bit-chunk; assert exact consistency."""
    assert len(text) == len(lengths), (len(text), len(lengths))
    assert int(lengths.sum()) == len(bitstr), (int(lengths.sum()), len(bitstr))
    code2char: dict[str, str] = {}
    pos = 0
    for ch, L in zip(text, lengths):
        code = bitstr[pos : pos + int(L)]
        pos += int(L)
        prev = code2char.setdefault(code, ch)
        assert prev == ch, f"codebook conflict at {code}: {prev!r} vs {ch!r}"
    # prefix-free check
    codes = sorted(code2char)
    for a in codes:
        for b in codes:
            assert a == b or not b.startswith(a), f"not prefix-free: {a} < {b}"
    assert len(code2char) == len(set(text)) == 30
    return code2char


def predicted_rows(text: str, code2char: dict) -> np.ndarray:
    """CHAIN B encoder model: v = bin2dec(code) mod 256 per char."""
    char2val = {c: int(code, 2) % 256 for code, c in code2char.items()}
    return np.array([char2val[c] for c in text[:BLOCK]], dtype=np.int64)


def rows_to_vals(mat: np.ndarray) -> np.ndarray:
    return (mat.astype(np.int64) * (1 << np.arange(8))).sum(axis=1)


def decoder_tables(text: str, code2char: dict, vals18: np.ndarray):
    """Two decode tables: `freq` (value -> most frequent colliding char —
    what any real decoder could at best do) and `oracle` (value -> the
    positionally most common TRUE char under the SNR=18 observation —
    an upper bound no real decoder can reach)."""
    char2val = {c: int(code, 2) % 256 for code, c in code2char.items()}
    freq_all = Counter(text)
    freq_table: dict[int, str] = {}
    for c, v in char2val.items():
        if v not in freq_table or freq_all[c] > freq_all[freq_table[v]]:
            freq_table[v] = c
    truth = np.array(list(text[:BLOCK]))
    oracle: dict[int, str] = {}
    for v in np.unique(vals18):
        chars = Counter(truth[vals18 == v].tolist())
        oracle[int(v)] = chars.most_common(1)[0][0]
    return freq_table, oracle


def frame_sentences(decoded: str, sents: list) -> tuple[list, list]:
    """Split the decoded char stream at the original sentence boundaries
    (the only framing the fixed-length block transmission preserves)."""
    refs, hyps, pos = [], [], 0
    for s in sents:
        if pos >= len(decoded):
            break
        refs.append(s)
        hyps.append(decoded[pos : pos + len(s)])
        pos += len(s)
    return refs, hyps


def main():
    from deepsc_gan_tpu.evaluate.metrics import BleuScore

    sents, bitstr, lengths, log, mats = load_artifacts()
    text = "".join(sents)

    code2char = recover_codebook(text, bitstr, lengths)
    print(f"CHAIN A ok: {len(code2char)} prefix-free codes, "
          f"{len(bitstr)} bits == sum(lengths), symbols == chars")

    pred = predicted_rows(text, code2char)
    pred_bits = ((pred[:, None] >> np.arange(8)) & 1).astype(np.uint8)
    vals = {snr: rows_to_vals(m) for snr, m in mats.items()}
    freq_table, oracle = decoder_tables(text, code2char, vals[18])

    bleu = BleuScore(1, 0, 0, 0)
    rows = []
    decoded_texts = {}
    for snr in SNRS:
        v = vals[snr]
        value_match = float((v == pred).mean())
        ber = float((mats[snr] != pred_bits).mean())
        dec_freq = "".join(freq_table.get(int(x), "#") for x in v)
        dec_orac = "".join(oracle.get(int(x), "#") for x in v)
        refs, hyps_f = frame_sentences(dec_freq, sents)
        _, hyps_o = frame_sentences(dec_orac, sents)
        b_freq = float(np.mean(bleu.compute_score(refs, hyps_f)))
        b_orac = float(np.mean(bleu.compute_score(refs, hyps_o)))
        char_acc = float(np.mean([c == t for c, t in zip(dec_freq, text[:BLOCK])]))
        rows.append(dict(snr=snr, ber=ber, value_match=value_match,
                         char_acc=char_acc, bleu1=b_freq, bleu1_oracle=b_orac))
        decoded_texts[str(snr)] = dec_freq
        print(f"SNR={snr:3d}  BER={ber:.4f}  value-match={value_match:.4f}  "
              f"BLEU1={b_freq:.4f}  BLEU1-oracle={b_orac:.4f}")

    log_by_snr = {int(r[0]): (float(r[1]), float(r[2])) for r in log}
    # the inconsistency in one number: published col1 at 18 dB vs the oracle
    gap18 = log_by_snr[18][0] - [r for r in rows if r["snr"] == 18][0]["bleu1_oracle"]
    # uncoded-fading diagnostic: BER ~ c/SNR_lin fit over the top 4 points
    hi = [r for r in rows if r["snr"] >= 9]
    c_fit = float(np.mean([r["ber"] * 10 ** (r["snr"] / 10) for r in hi]))
    print(f"\npublished col1@18dB={log_by_snr[18][0]:.4f} vs oracle "
          f"upper bound={log_by_snr[18][0]-gap18:.4f} (gap {gap18:.3f})")
    print(f"BER*SNR_lin ~= {c_fit:.2f} constant over 9..18 dB "
          f"(uncoded-fading signature; coded AWGN would be ~0 above waterfall)")

    out = dict(
        chain_a="exact: char-level Huffman, 30 prefix-free codes, "
                "422459 bits == sum(huffman_word_length), symbols == chars "
                "of the 1000 concatenated sentences",
        chain_b="msgOutBytes row = de2bi(bin2dec(code) mod 256, 8) of the "
                "first 1012 chars; bin2dec drops leading zeros so codes "
                "collide (lossy by construction)",
        per_snr=rows,
        published_log=[[int(r[0]), float(r[1]), float(r[2])] for r in log],
        conclusion=dict(
            consistent_with_log=False,
            oracle_bleu1_at_18dB=float(log_by_snr[18][0] - gap18),
            published_col1_at_18dB=float(log_by_snr[18][0]),
            ber_times_snr_lin_9_18dB=c_fit,
            verdict="log.pkl was not computed from the committed "
                    "common/output/*.mat bits: the bits are an uncoded "
                    "fading-channel run through a lossy (leading-zero-"
                    "dropping) code conversion whose oracle decode cannot "
                    "reach the published curve; the published curve is a "
                    "separate (presumably properly coded) run whose "
                    "outputs were never committed.",
        ),
    )
    os.makedirs("results", exist_ok=True)
    with open("results/classical_decode.json", "w") as f:
        json.dump(out, f, indent=1)
    with open("results/classical_decoded_text.json", "w") as f:
        json.dump(decoded_texts, f, indent=1)
    print("\nwrote results/classical_decode.json, "
          "results/classical_decoded_text.json")


if __name__ == "__main__":
    main()
