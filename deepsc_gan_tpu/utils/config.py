"""Configuration for the framework.

Field names and defaults mirror the reference's argparse namespace
(`DeepSC-GAN/utlis/parameters.py:5-65`) so a reference user can move their
flags over 1:1, but the implementation is a frozen dataclass that is
hashable (usable as a `jit` static argument) and CLI-overridable.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Any, Optional


@dataclass(frozen=True)
class Config:
    # --- data paths (reference: parameters.py:9-17; Windows notebook paths dropped)
    input_data_dir: str = "data/txt/en"
    train_save_path: str = "data/txt/train_data.pkl"
    test_save_path: str = "data/txt/test_data.pkl"
    vocab_path: str = "data/txt/vocab.json"
    log_save_path: str = "log"
    checkpoint_path: str = "checkpoint"

    # --- training (reference: parameters.py:20-27)
    bs: int = 64
    shuffle_size: int = 22234
    lr: float = 5e-4
    epochs: int = 60
    train_with_mine: bool = False
    mine_lambda: float = 0.0009  # weight of the -MI term when train_with_mine
    max_length: int = 30        # decode steps (reference: parameters.py:36)
    # Padded sentence length. The reference pads to 31 (dataloader.py:11);
    # the framework default is the lane-aligned 32: the extra column is
    # <PAD> (attention masks and the loss already ignore it), and the
    # paired same-seed/same-budget quality gate came out equal-or-better
    # at every SNR with +9.9% step throughput at the flagship shape
    # (RESULTS.md "Sequence-pad layout A/B"; log/seq_ab/). Pass
    # --seq-len 31 for reference-protocol parity runs.
    seq_len: int = 32
    channel: str = "AWGN"       # AWGN | Rayleigh | Rician (parameters.py:37)

    # --- model (reference: parameters.py:40-50)
    vocab_size: int = 22234
    encoder_num_layer: int = 4
    encoder_d_model: int = 128
    encoder_d_ff: int = 512
    encoder_num_heads: int = 8
    encoder_dropout: float = 0.1
    decoder_num_layer: int = 4
    decoder_d_model: int = 128
    decoder_d_ff: int = 512
    decoder_num_heads: int = 8
    decoder_dropout: float = 0.1

    # --- star-transformer (reference: parameters.py:53-54)
    cycle_num: int = 8
    cycle_layers: int = 8

    # --- channel codec (reference hard-codes 256/16 at transceiver.py:128,
    #     and channel-decoder hidden 512 at transceiver.py:131)
    channel_hidden: int = 256
    channel_dim: int = 16
    channel_dec_hidden: int = 512

    # --- SNR (reference: parameters.py:58-59)
    train_snr: int = 3
    test_snr: int = 6
    # extension: sample the training SNR per step from U(lo, hi) dB
    # instead of the fixed train_snr — the reference's 3dB-only training
    # never shows the codec a clean channel, capping high-SNR BLEU.
    # train_snr_mix blends both: with that probability draw U(lo, hi),
    # else use the fixed train_snr (keeps low-SNR mass while covering the
    # full range; measured tradeoff in RESULTS.md).
    train_snr_random: bool = False
    train_snr_lo: float = 0.0
    train_snr_hi: float = 18.0
    train_snr_mix: float = 1.0  # P(uniform draw) when train_snr_random

    # --- quirk switches (SURVEY.md §7 Q1-Q3; defaults = reference behavior)
    # Q1: the reference FFN sublayer is accidentally an identity layer
    #     (modules.py:389-401). "mlp" gives the intended ReLU MLP.
    ffn_mode: str = "mlp"  # "mlp" | "identity"
    # Q2: the reference intends to mask token ids 4 ('') and 5 ('!') in the
    #     loss but a bug makes it pad-only (modules.py:749-750).
    mask_extra_tokens: bool = False
    # Q3: the reference computes LS/MMSE equalization but returns the
    #     UN-equalized fading output (transceiver.py:74-81).
    equalizer: Optional[str] = None  # None | "LS" | "MMSE"

    # --- special token ids (reference: preprocess_text.py:17-22)
    pad_idx: int = 0
    start_idx: int = 1
    end_idx: int = 2
    unk_idx: int = 3

    # --- quality levers (round-2 extensions beyond the reference recipe;
    #     all default OFF so the defaults reproduce the reference exactly)
    tie_embeddings: bool = False   # share decoder embedding w/ vocab proj
    label_smoothing: float = 0.0   # uniform label smoothing alpha
    aug_crop: float = 0.0          # P(random contiguous word-span crop)
    aug_concat: float = 0.0        # P(concat two sentences, truncate)
    aug_synth: float = 0.0         # P(synthetic full-vocab sentence)
    # per-row fade draw in training (same marginal statistics as the
    # reference's one-scalar-per-call fade, 64x more realizations/step;
    # keep False for reference-protocol evals — models/channel.py:fading)
    fading_per_sample: bool = False
    # exponential moving average of params (0 = off). When on, TrainState
    # carries ema_params updated each step; evaluate with those
    # (train/steps.py:eval_params) — a standard low-SNR quality lever
    ema_decay: float = 0.0

    # --- schedule (reference: modules.py:719-735; the committed notebooks
    #     used plain Adam(lr) per parameters.py:22 — "noam" optional)
    schedule: str = "constant"  # "constant" | "noam" | "cosine"
    warmup_steps: int = 4000
    decay_steps: int = 40000    # cosine schedule horizon (extension)

    # --- GAN (reference: gan_train.py:8-50)
    gan_lambda: float = 0.5   # lenmda in gan_train_step
    gan_pnr_db: float = 40.0  # PNR used during GAN training (gan_train.py:16)
    g_loss_ceiling: float = 10.0  # g_loss = ceiling - CE(pred_p) (gan_train.py:21)

    # --- compute
    dtype: str = "bfloat16"      # activations dtype on TPU
    param_dtype: str = "float32"
    # PRNG implementation for the training step's key (dropout masks +
    # channel noise). "threefry" is JAX's default splittable PRNG;
    # profiling at compute-bound scale (results/profile_d256.json) shows
    # its mask generation dominating the step (~45% in elementwise
    # fusions), so "rbg" (XLA's RngBitGenerator — same API, hardware
    # generator, identical distributions, different stream) is the
    # production choice at scale. Reproducibility at a fixed seed holds
    # within an impl, not across impls.
    rng_impl: str = "threefry"   # "threefry" | "rbg" | "unsafe_rbg"
    # rematerialize each transformer layer in the backward pass
    # (jax.checkpoint / nn.remat): trades ~1/3 more layer FLOPs for not
    # round-tripping the fwd intermediates through HBM — a throughput WIN
    # once the step is bandwidth-bound (profiled at d_model>=256,
    # results/mfu_ablation.json). Default off = reference-exact autodiff.
    remat: bool = False
    # fused vocab-projection+CE (ops/fused_ce.py): streams the 22k-vocab
    # softmax over chunks instead of materializing (B,L,V) logits — the
    # train step is HBM-bound on that tensor. Same numerics to ~1e-5.
    fused_ce: bool = True
    ce_chunk: int = 2048
    # packed QKV projections (ops/attention.py:set_qkv_fusion): trace the
    # three per-attention Q/K/V matmuls as ONE (D, 3*H*Dh) MXU contraction
    # (K/V pair-packed for cross-attention). Param tree is identical either
    # way — the kernels are stacked at trace time — so checkpoints are
    # interchangeable. A/B-measured in RESULTS.md ("packed QKV").
    fuse_qkv: bool = False

    # --- parallelism (new capability; the reference is single-device)
    dp: int = 1   # data-parallel mesh size
    tp: int = 1   # tensor-parallel (vocab/heads) mesh size
    pp: int = 1   # pipeline-parallel stages (parallel/pipeline.py GPipe)
    pp_microbatches: int = 4  # GPipe microbatches per step (bs divisible)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def d_model(self) -> int:
        return self.encoder_d_model


def default_config(**kw: Any) -> Config:
    return Config(**kw)


def default_seq_len(variant: str) -> int:
    """Lane-aligned padded length for a model `variant`.

    The TPU vector layout tiles the trailing dims in (8 sublane, 128
    lane) granules; 32 attention rows tile that granule (and the MXU)
    cleanly where 31 forces padded/odd layouts, so the padded sentence
    length should make the attention row count a multiple of 32.
    Plain transformers attend over exactly L rows, so L=32 aligns. The
    star codec appends ONE relay row to the satellite ring (the
    reference's `[s; h]` relay context, models/modules.py:174), so its aligned
    length is L=31 (31 satellites + relay = 32 rows) — measured 1.066x
    (pallas) / 1.028x (xla) over L=32 on v5e
    (results/star_seq_ab_r4.json; transformer A/B in seq_ab_r4.json).
    """
    return 31 if "star" in variant else 32  # star, star_multi, gan_star


def add_config_args(parser: argparse.ArgumentParser) -> None:
    """Register every Config field as a --flag (dashes for underscores)."""
    for f in dataclasses.fields(Config):
        name = "--" + f.name.replace("_", "-")
        if f.name == "seq_len":
            # None sentinel: commands that know the model variant resolve
            # an unset --seq-len to default_seq_len(variant) (star aligns
            # at 31, transformer at 32); config_from_args falls back to
            # the dataclass default otherwise.
            parser.add_argument(name, type=int, default=None)
        elif f.type == "bool" or isinstance(f.default, bool):
            # --flag / --no-flag pairs so True defaults stay disableable
            parser.add_argument(name, action=argparse.BooleanOptionalAction,
                                default=f.default)
        else:
            typ = type(f.default) if f.default is not None else str
            parser.add_argument(name, type=typ, default=f.default)


def config_from_args(args: argparse.Namespace) -> Config:
    names = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in names}
    if kw.get("seq_len") is None:  # unset sentinel -> dataclass default
        kw.pop("seq_len", None)
    return Config(**kw)


def para_config(argv: Optional[list] = None) -> Config:
    """Drop-in analogue of the reference's `para_config()`
    (`DeepSC-GAN/utlis/parameters.py:5-65`): parse known args only, so it
    also works inside notebooks."""
    parser = argparse.ArgumentParser()
    add_config_args(parser)
    ns, _ = parser.parse_known_args(argv)
    return config_from_args(ns)
