"""End-to-end classical Huffman+Turbo+QAM baseline sweep.

Regenerates the reference's MATLAB-artifact-only curves in code
(`DeepSC-GAN/common/log/log.pkl` and `Turbo+FGM.pkl` — SURVEY.md §2.36):
word-level Huffman -> per-sentence rate-1/3 turbo block -> Gray M-QAM ->
AWGN (+ optional worst-case perturbation at PNR dB) -> max-log LLR demap
-> iterative BCJR (JAX, batched over all sentences) -> Huffman decode ->
BLEU-1. Output rows: [snr, bleu_attacked, bleu_clean] (the Turbo+FGM.pkl
layout).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from deepsc_gan_tpu.baselines.huffman import HuffmanCodec
from deepsc_gan_tpu.baselines.modem import QamModem
from deepsc_gan_tpu.baselines.turbo import TurboCodec
from deepsc_gan_tpu.evaluate.metrics import BleuScore


def classical_sweep(
    sentences: Sequence[str],
    snrs: Sequence[float],
    block_k: int = 512,
    iters: int = 6,
    mod_bits: int = 6,
    pnr_db: float = 10.0,
    seed: int = 0,
    verbose: bool = True,
    include_attacked: bool = True,
    coding: str = "turbo",
) -> list[list[float]]:
    """-> rows [snr, bleu_attacked, bleu_clean] over the SNR sweep.
    `include_attacked=False` skips the attacked column (half the decode
    work — used by the calibration grid, scripts/calibrate_classical.py)
    and emits [snr, nan, bleu_clean] rows.

    `coding="none"` transmits the Huffman bits UNCODED (hard-decision
    demap, no turbo): the calibration finding
    (results/classical_calibration.json) is that the reference's
    `log.pkl` clean curve — gradual over 12+ dB — is numerically
    consistent with uncoded 64-QAM + Huffman resynchronization and
    inconsistent with ANY blockwise turbo config (threshold codes cliff
    over 1-3 dB)."""
    if coding not in ("turbo", "none"):
        raise ValueError(f"coding must be 'turbo' or 'none', got {coding}")
    words = [s.split() for s in sentences]
    huff = HuffmanCodec(words)
    enc = [huff.encode(w) for w in words]
    n_bits = np.array([len(b) for b in enc])
    if n_bits.max() > block_k:
        raise ValueError(
            f"longest sentence needs {n_bits.max()} bits > block_k")
    if verbose:
        print(f"{len(sentences)} sentences, Huffman bits/sentence "
              f"mean={n_bits.mean():.1f} max={n_bits.max()}", flush=True)

    # one turbo block per sentence (the reference's per-sentence
    # msgOutBytes framing, common/output/SNR=*.mat)
    flat = np.zeros((len(enc), block_k), dtype=np.uint8)
    for i, b in enumerate(enc):
        flat[i, : len(b)] = b
    modem = QamModem(mod_bits)
    if coding == "none":
        tc = None
        n_total = flat.size
        tx = modem.modulate(flat.ravel())
    else:
        tc = TurboCodec(block_k=block_k, iters=iters, seed=seed)
        sym, n_total = tc.encode(flat.ravel())
        coded_bits = (sym < 0).astype(np.uint8)  # (3, n_sent, K)
        tx = modem.modulate(coded_bits)
    if verbose:
        print(f"coding={coding}: {n_total} bits -> {len(tx)} QAM symbols",
              flush=True)

    bleu = BleuScore(1, 0, 0, 0)
    rng = np.random.default_rng(seed)
    rows = []
    for snr in snrs:
        snr = float(snr)
        sigma = float(1.0 / np.sqrt(10.0 ** (snr / 10.0)))
        noise = sigma / np.sqrt(2.0) * (
            rng.standard_normal(len(tx))
            + 1j * rng.standard_normal(len(tx)))
        scores = {True: float("nan")}
        for attacked in ((True, False) if include_attacked else (False,)):
            y = tx + noise
            if attacked:
                # worst-case-direction physical-layer perturbation at
                # PNR dB over the noise power (the reference's PNR
                # convention, models/transceiver.py:25-33): push each
                # symbol opposite to itself — the FGM optimum direction
                # for a distance demapper
                amp = sigma * np.sqrt(10.0 ** (pnr_db / 10.0))
                safe = np.where(np.abs(tx) > 0, np.abs(tx), 1.0)
                y = y - amp * tx / safe
            llr_flat = modem.llr(y, sigma)
            if coding == "none":
                # hard decision: LLR > 0 means bit 0 (modem convention)
                dec = (llr_flat[: flat.size] < 0).astype(
                    np.uint8).reshape(len(enc), block_k)
            else:
                llr = llr_flat[: coded_bits.size].reshape(coded_bits.shape)
                dec = tc.decode(llr, n_total).reshape(len(enc), block_k)
            hyps = [" ".join(huff.decode(dec[i, : n_bits[i]]))
                    for i in range(len(enc))]
            scores[attacked] = float(np.mean(
                bleu.compute_score(list(sentences), hyps)))
        rows.append([snr, scores[True], scores[False]])
        if verbose:
            print(f"SNR={snr:4.1f}dB attacked={scores[True]:.4f} "
                  f"clean={scores[False]:.4f}", flush=True)
    return rows
