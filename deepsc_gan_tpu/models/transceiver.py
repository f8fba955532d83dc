"""Transceiver assemblies: semantic codec + channel codec + channel.

Behavioral spec from the reference (`DeepSC-GAN/models/transceiver.py:115-300`):
semantic encode -> channel encode (power-normed 16-dim symbols) -> noisy
channel -> channel decode -> semantic decode -> vocab logits; four variants
(vanilla Transformer, multi-layer star, single-block star, GAN-augmented).

The TPU-first re-design splits the forward into STAGES — `encode` (up to
the transmitted symbols tx) and `decode` (from received symbols y to
logits) — because every attack in the system differentiates the loss
w.r.t. an INTERMEDIATE (tx or y, reference utlis/trainer.py:44,
utlis/eval.py:33,211): with staged methods this is a plain `jax.grad` of
`decode`-side loss w.r.t. its input, no tape surgery. The channel is a
pure function of an explicit PRNG key between the stages.

`__call__` composes the stages and returns the reference 4-tuple
`(logits, tx, y, y)` so step functions port 1:1. All shapes derive from
the config (fixing quirk Q5 — the reference hard-codes [64,31,16]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepsc_gan_tpu.models.channel import (
    ChannelDecoder,
    ChannelEncoder,
    channel as channel_fn,
)
from deepsc_gan_tpu.models.gan import Generator
from deepsc_gan_tpu.models.star import SD, SE, SDecoder, SEncoder
from deepsc_gan_tpu.models.transformer import Decoder, Encoder
from deepsc_gan_tpu.utils.config import Config


def _dtypes(cfg: Config):
    return jnp.dtype(cfg.dtype), jnp.dtype(cfg.param_dtype)


class _TransceiverBase(nn.Module):
    """Shared stage plumbing. Subclasses define semantic_encoder /
    semantic_decoder in setup()."""

    cfg: Config

    # --- stages -----------------------------------------------------------
    def encode(self, inp, enc_padding_mask=None, *, deterministic: bool = True):
        """tokens -> power-normalized channel symbols tx (B, L, channel_dim)."""
        sema = self.semantic_encoder(inp, enc_padding_mask,
                                     deterministic=deterministic)
        return self.channel_encoder(sema)

    def transmit(self, key, tx, p, pnr_db, n_std, channel_kind: Optional[str] = None):
        """tx -> received symbols y through the configured channel."""
        kind = channel_kind or self.cfg.channel
        return channel_fn(key, tx, p, pnr_db, n_std, kind=kind,
                          equalizer=self.cfg.equalizer,
                          per_sample=self.cfg.fading_per_sample)

    def decode(self, tar_inp, y, combined_mask=None, dec_padding_mask=None,
               *, deterministic: bool = True, apply_final: bool = True):
        """received symbols y (+ teacher-forced target prefix) -> logits."""
        mem = self.channel_decoder(y)
        return self._semantic_decode(tar_inp, mem, combined_mask,
                                     dec_padding_mask,
                                     deterministic=deterministic,
                                     apply_final=apply_final)

    def channel_decode(self, y):
        """received symbols -> decoder memory (exposed as a stage so greedy
        decoding can run it ONCE outside the token loop)."""
        return self.channel_decoder(y)

    def decode_loss_ready(self, tar_inp, y, combined_mask=None,
                          dec_padding_mask=None, *, deterministic: bool = True):
        """decode() without the final vocab projection — pair with the fused
        logits+CE path in ops/pallas."""
        return self.decode(tar_inp, y, combined_mask, dec_padding_mask,
                           deterministic=deterministic, apply_final=False)

    # --- composition ------------------------------------------------------
    def __call__(self, inp, tar_inp, key, p, pnr_db,
                 channel_kind: Optional[str] = None, n_std=0.1,
                 enc_padding_mask=None, combined_mask=None,
                 dec_padding_mask=None, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        tx = self.encode(inp, enc_padding_mask, deterministic=deterministic)
        y = self.transmit(key, tx, p, pnr_db, n_std, channel_kind)
        logits = self.decode(tar_inp, y, combined_mask, dec_padding_mask,
                             deterministic=deterministic)
        # reference returns (predictions, channel_enc_output, received,
        # received) — transceiver.py:161
        return logits, tx, y, y

    def _semantic_decode(self, tar_inp, mem, combined_mask, dec_padding_mask,
                         *, deterministic, apply_final=True):
        return self.semantic_decoder(tar_inp, mem, combined_mask,
                                     dec_padding_mask,
                                     deterministic=deterministic,
                                     apply_final=apply_final)

    def final_projection(self, x):
        return self.semantic_decoder.final_projection(x)


class Transceiver(_TransceiverBase):
    """Vanilla DeepSC transceiver (reference `Transeiver` [sic],
    transceiver.py:115-161)."""

    def setup(self):
        cfg = self.cfg
        dtype, param_dtype = _dtypes(cfg)
        self.semantic_encoder = Encoder(
            cfg.encoder_num_layer, cfg.encoder_num_heads, cfg.encoder_d_model,
            cfg.encoder_d_ff, cfg.vocab_size, cfg.encoder_dropout,
            cfg.ffn_mode, remat=cfg.remat, dtype=dtype,
            param_dtype=param_dtype)
        self.semantic_decoder = Decoder(
            cfg.decoder_num_layer, cfg.decoder_d_model, cfg.decoder_num_heads,
            cfg.decoder_d_ff, cfg.vocab_size, cfg.decoder_dropout,
            cfg.ffn_mode, tie_embeddings=cfg.tie_embeddings,
            remat=cfg.remat, dtype=dtype, param_dtype=param_dtype)
        self.channel_encoder = ChannelEncoder(
            cfg.channel_hidden, cfg.channel_dim, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_decoder = ChannelDecoder(
            cfg.decoder_d_model, cfg.channel_dec_hidden, dtype=dtype,
            param_dtype=param_dtype)



class TransceiverStarMulti(_TransceiverBase):
    """Multi-layer Star-Transformer transceiver (reference
    `Transeiver_star`, transceiver.py:163-206)."""

    def setup(self):
        cfg = self.cfg
        dtype, param_dtype = _dtypes(cfg)
        self.semantic_encoder = SEncoder(
            cfg.cycle_num, cfg.encoder_num_layer, cfg.encoder_num_heads,
            cfg.encoder_d_model, cfg.encoder_d_ff, cfg.vocab_size,
            cfg.encoder_dropout, cfg.ffn_mode, dtype=dtype,
            param_dtype=param_dtype)
        self.semantic_decoder = SDecoder(
            cfg.cycle_num, cfg.decoder_num_layer, cfg.decoder_d_model,
            cfg.decoder_num_heads, cfg.decoder_d_ff, cfg.vocab_size,
            cfg.decoder_dropout, cfg.ffn_mode,
            tie_embeddings=cfg.tie_embeddings, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_encoder = ChannelEncoder(
            cfg.channel_hidden, cfg.channel_dim, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_decoder = ChannelDecoder(
            cfg.decoder_d_model, cfg.channel_dec_hidden, dtype=dtype,
            param_dtype=param_dtype)



class TransceiverStar(_TransceiverBase):
    """Single-block Star-Transformer transceiver (reference
    `Transeiver_Star`, transceiver.py:208-245) — the variant the committed
    reference checkpoints contain."""

    def setup(self):
        cfg = self.cfg
        dtype, param_dtype = _dtypes(cfg)
        self.semantic_encoder = SE(
            cfg.cycle_num, cfg.encoder_num_heads, cfg.encoder_d_model,
            cfg.encoder_d_ff, cfg.vocab_size, cfg.encoder_dropout,
            cfg.ffn_mode, dtype=dtype, param_dtype=param_dtype)
        self.semantic_decoder = SD(
            cfg.cycle_num, cfg.decoder_d_model, cfg.decoder_num_heads,
            cfg.decoder_d_ff, cfg.vocab_size, cfg.decoder_dropout,
            cfg.ffn_mode, tie_embeddings=cfg.tie_embeddings, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_encoder = ChannelEncoder(
            cfg.channel_hidden, cfg.channel_dim, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_decoder = ChannelDecoder(
            cfg.decoder_d_model, cfg.channel_dec_hidden, dtype=dtype,
            param_dtype=param_dtype)



class TransceiverGAN(_TransceiverBase):
    """GAN-augmented transceiver (reference `Transeiver_GAN`,
    transceiver.py:247-300): vanilla pipeline + perturbation generator G.
    The channel runs TWICE — perturbed (p or G(tx)) and clean (p=0) — and
    both receptions are decoded. Returns (pred_p, pred_r, tx, y_r)."""

    def setup(self):
        cfg = self.cfg
        dtype, param_dtype = _dtypes(cfg)
        self.semantic_encoder = Encoder(
            cfg.encoder_num_layer, cfg.encoder_num_heads, cfg.encoder_d_model,
            cfg.encoder_d_ff, cfg.vocab_size, cfg.encoder_dropout,
            cfg.ffn_mode, remat=cfg.remat, dtype=dtype,
            param_dtype=param_dtype)
        self.semantic_decoder = Decoder(
            cfg.decoder_num_layer, cfg.decoder_d_model, cfg.decoder_num_heads,
            cfg.decoder_d_ff, cfg.vocab_size, cfg.decoder_dropout,
            cfg.ffn_mode, tie_embeddings=cfg.tie_embeddings,
            remat=cfg.remat, dtype=dtype, param_dtype=param_dtype)
        self.generator = Generator(cfg.channel_hidden, cfg.channel_dim,
                                   dtype=dtype, param_dtype=param_dtype)
        self.channel_encoder = ChannelEncoder(
            cfg.channel_hidden, cfg.channel_dim, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_decoder = ChannelDecoder(
            cfg.decoder_d_model, cfg.channel_dec_hidden, dtype=dtype,
            param_dtype=param_dtype)


    def generate_perturbation(self, tx):
        return self.generator(tx)

    def __call__(self, inp, tar_inp, key, p, pnr_db,
                 channel_kind: Optional[str] = None, n_std=0.1,
                 enc_padding_mask=None, combined_mask=None,
                 dec_padding_mask=None, *, deterministic: bool = True,
                 traingan: bool = False):
        tx = self.encode(inp, enc_padding_mask, deterministic=deterministic)
        if traingan:
            p = self.generator(tx)
        key_p, key_r = jax.random.split(key)
        y_p = self.transmit(key_p, tx, p, pnr_db, n_std, channel_kind)
        y_r = self.transmit(key_r, tx, jnp.zeros_like(tx), pnr_db, n_std,
                            channel_kind)
        pred_p = self.decode(tar_inp, y_p, combined_mask, dec_padding_mask,
                             deterministic=deterministic)
        pred_r = self.decode(tar_inp, y_r, combined_mask, dec_padding_mask,
                             deterministic=deterministic)
        return pred_p, pred_r, tx, y_r


class TransceiverGANStar(TransceiverGAN):
    """GAN-augmented STAR transceiver — an EXTENSION beyond the reference
    (its `Transeiver_GAN` is vanilla-only, transceiver.py:247): the same
    dual-channel 3-phase GAN training story (generator-produced
    perturbation, channel run twice, both receptions decoded) wrapped
    around the single-block SE/SD star codec of `Transeiver_Star`
    (transceiver.py:208-245), so the star variant gets the robustness
    training the reference reserved for the vanilla codec. Inherits
    TransceiverGAN.__call__ (pred_p, pred_r, tx, y_r); note SD decodes at
    MEMORY length — train with full_target=True like the other star
    paths."""

    def setup(self):
        cfg = self.cfg
        dtype, param_dtype = _dtypes(cfg)
        self.semantic_encoder = SE(
            cfg.cycle_num, cfg.encoder_num_heads, cfg.encoder_d_model,
            cfg.encoder_d_ff, cfg.vocab_size, cfg.encoder_dropout,
            cfg.ffn_mode, dtype=dtype, param_dtype=param_dtype)
        self.semantic_decoder = SD(
            cfg.cycle_num, cfg.decoder_d_model, cfg.decoder_num_heads,
            cfg.decoder_d_ff, cfg.vocab_size, cfg.decoder_dropout,
            cfg.ffn_mode, tie_embeddings=cfg.tie_embeddings, dtype=dtype,
            param_dtype=param_dtype)
        self.generator = Generator(cfg.channel_hidden, cfg.channel_dim,
                                   dtype=dtype, param_dtype=param_dtype)
        self.channel_encoder = ChannelEncoder(
            cfg.channel_hidden, cfg.channel_dim, dtype=dtype,
            param_dtype=param_dtype)
        self.channel_decoder = ChannelDecoder(
            cfg.decoder_d_model, cfg.channel_dec_hidden, dtype=dtype,
            param_dtype=param_dtype)


VARIANTS = {
    "transformer": Transceiver,
    "star_multi": TransceiverStarMulti,
    "star": TransceiverStar,
    "gan": TransceiverGAN,
    "gan_star": TransceiverGANStar,
}


def make_model(cfg: Config, variant: str = "transformer") -> _TransceiverBase:
    """Factory over the four reference transceiver variants."""
    try:
        return VARIANTS[variant](cfg=cfg)
    except KeyError:
        raise ValueError(
            f"unknown variant {variant!r}; choose from {sorted(VARIANTS)}")
