"""Regenerate the classical Huffman+Turbo baseline curves IN CODE.

Thin wrapper over `deepsc_gan_tpu.baselines.pipeline.classical_sweep`
(also exposed as `python -m deepsc_gan_tpu.cli baseline`). The reference
ships this capability as MATLAB artifacts only (`DeepSC-GAN/common/` —
SURVEY.md §2.36); output here follows its `Turbo+FGM.pkl` layout:
rows [snr, bleu_attacked, bleu_clean] into results/classical-log.pkl.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepsc_gan_tpu.baselines.pipeline import classical_sweep

REF_SENTS = "/root/reference/DeepSC-GAN/common/data/data.pkl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=REF_SENTS)
    ap.add_argument("--out", default="results/classical-log.pkl")
    ap.add_argument("--block-k", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--mod-bits", type=int, default=6, help="6 = 64-QAM")
    ap.add_argument("--pnr-db", type=float, default=10.0)
    ap.add_argument("--snrs", default=",".join(str(s) for s in range(19)))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    with open(args.data, "rb") as f:
        sentences = pickle.load(f)
    rows = classical_sweep(
        sentences, [float(s) for s in args.snrs.split(",")],
        block_k=args.block_k, iters=args.iters, mod_bits=args.mod_bits,
        pnr_db=args.pnr_db, seed=args.seed)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(rows, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
