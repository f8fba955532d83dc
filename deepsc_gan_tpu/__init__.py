"""deepsc_gan_tpu — TPU-native semantic-communication framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
DeepSC-GAN reference (jiang99999/DeepSC-GAN): an end-to-end text
semantic-communication system (Transformer/Star-Transformer semantic codec +
dense channel codec + differentiable AWGN/Rayleigh/Rician channel) with
FGM/PGD physical-layer attacks, GAN-based perturbation training, a MINE
mutual-information objective, and SNR-swept BLEU evaluation — all built
TPU-first: pure functions with explicit PRNG keys, staged forwards so
grad-w.r.t.-intermediate attacks are natural `jax.grad` calls, `lax.scan`
greedy decoding, optax parameter partitions for the GAN phases, and
`jax.sharding` device-mesh parallelism over ICI.

Layer map (mirrors SURVEY.md §1 of the reference, re-designed for TPU):
  data/      — Europarl preprocessing + vocab + padded batch loading
  ops/       — positional encoding, attention, masks, losses, schedules
  models/    — transformer & star codecs, channel sim, GAN nets, transceivers
  train/     — train steps (plain / FGM adversarial / GAN 3-phase / MINE)
  evaluate/  — greedy decoding, SNR sweeps, BLEU / similarity metrics
  parallel/  — device mesh + sharding (dp over batch, snr-sweep sharding)
  utils/     — config, checkpointing (orbax), metric logging, profiling
"""

__version__ = "0.1.0"

from deepsc_gan_tpu.utils.config import Config, default_config  # noqa: F401
