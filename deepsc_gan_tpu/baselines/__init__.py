"""Classical source/channel-coding baselines (Huffman + Turbo).

The reference ships this capability as MATLAB *artifacts only* — decoded
bit matrices and BLEU tables under `DeepSC-GAN/common/` (SURVEY.md §2.36:
"No code — produced by MATLAB offline"). This package is a from-scratch,
runnable implementation of that pipeline: word-level Huffman source
coding + rate-1/3 turbo channel coding (max-log-MAP BCJR, JAX-vectorized
over blocks) + BPSK over AWGN, so the `common/log/log.pkl` /
`Turbo+FGM.pkl` curves can be regenerated in-repo.
"""

from deepsc_gan_tpu.baselines.huffman import HuffmanCodec
from deepsc_gan_tpu.baselines.turbo import TurboCodec

__all__ = ["HuffmanCodec", "TurboCodec"]
