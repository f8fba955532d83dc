"""Vanilla Transformer semantic encoder/decoder.

Behavioral spec from the reference (`DeepSC-GAN/models/modules.py:405-552`):
post-LN residual blocks (attn + residual + LN, FFN + residual + LN),
embedding scaled by sqrt(d_model) + sinusoidal PE + dropout, N layers,
decoder ends with a vocab-logits dense.

Quirk Q1 (SURVEY.md §7): the reference FFN sublayer is accidentally an
identity layer (modules.py:389-401 defines no `call`). `ffn_mode="mlp"`
(default) gives the intended ReLU MLP dff->d_model; `ffn_mode="identity"`
reproduces the reference for curve-parity runs.

TPU notes: layers are unrolled Python loops over distinct-parameter blocks
(N=4 — unrolling lets XLA pipeline them; a scan-over-layers variant is not
worth it at this depth). Activations run in `dtype` (bf16 on TPU), params
and layernorm statistics in f32.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from deepsc_gan_tpu.ops.attention import MultiHeadAttention
from deepsc_gan_tpu.ops.positional import positional_encoding


class FeedForward(nn.Module):
    d_model: int
    dff: int
    mode: str = "mlp"  # "mlp" | "identity" (quirk Q1)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "identity":
            return x
        h = nn.relu(nn.Dense(self.dff, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc1")(x))
        return nn.Dense(self.d_model, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(h)


class EncoderLayer(nn.Module):
    """MHA + residual+LN, FFN + residual+LN (reference EncoderLayer,
    modules.py:405-431)."""

    d_model: int
    num_heads: int
    dff: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        attn = MultiHeadAttention(self.d_model, self.num_heads,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  name="mha")(x, x, x, mask)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out1 = ln("ln1")(x + attn)

        ffn = FeedForward(self.d_model, self.dff, self.ffn_mode,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="ffn")(out1)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return ln("ln2")(out1 + ffn)


class DecoderLayer(nn.Module):
    """Masked self-attn, cross-attn, FFN; 3x residual+LN (reference
    DecoderLayer, modules.py:433-469)."""

    d_model: int
    num_heads: int
    dff: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_output, look_ahead_mask, padding_mask,
                 *, deterministic: bool):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        mha = lambda name: MultiHeadAttention(
            self.d_model, self.num_heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        attn1 = mha("self_mha")(x, x, x, look_ahead_mask)
        attn1 = nn.Dropout(self.dropout)(attn1, deterministic=deterministic)
        out1 = ln("ln1")(x + attn1)

        attn2 = mha("cross_mha")(out1, enc_output, enc_output, padding_mask)
        attn2 = nn.Dropout(self.dropout)(attn2, deterministic=deterministic)
        out2 = ln("ln2")(attn2 + out1)

        ffn = FeedForward(self.d_model, self.dff, self.ffn_mode,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="ffn")(out2)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return ln("ln3")(ffn + out2)


class TokenEmbed(nn.Module):
    """Embedding * sqrt(d_model) + PE + dropout — the shared stack prologue
    (reference Encoder.call, modules.py:493-505)."""

    vocab_size: int
    d_model: int
    dropout: float = 0.1
    max_position: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_model,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, tokens, *, deterministic: bool):
        seq_len = tokens.shape[1]
        x = self.embedding(tokens)
        x = x * jnp.sqrt(jnp.asarray(self.d_model, self.dtype))
        pe = positional_encoding(self.max_position, self.d_model, self.dtype)
        x = x + pe[:, :seq_len, :]
        return self.drop(x, deterministic=deterministic)

    def table(self) -> jnp.ndarray:
        """The raw (V, D) embedding table — exposed so a tied decoder can
        reuse it as the output projection (`logits = h @ E.T`)."""
        return self.embedding.embedding


def _maybe_remat(layer_call, remat: bool):
    """Optionally wrap a layer invocation in nn.remat (jax.checkpoint):
    the layer's intermediates are recomputed in the backward instead of
    round-tripping HBM — a net win once training is bandwidth-bound
    (Config.remat). The caller's lambda closes over `deterministic` as a
    static value."""
    if not remat:
        return layer_call
    return nn.remat(layer_call, prevent_cse=False)


class Encoder(nn.Module):
    """Embedding prologue + N x EncoderLayer (reference Encoder,
    modules.py:471-511)."""

    num_layers: int
    num_heads: int
    d_model: int
    dff: int
    vocab_size: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    max_position: int = 512
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask, *, deterministic: bool = True):
        x = TokenEmbed(self.vocab_size, self.d_model, self.dropout,
                       self.max_position, self.dtype, self.param_dtype,
                       name="embed")(tokens, deterministic=deterministic)
        run = _maybe_remat(
            lambda mdl, x, mask: mdl(x, mask, deterministic=deterministic),
            self.remat)
        for i in range(self.num_layers):
            layer = EncoderLayer(self.d_model, self.num_heads, self.dff,
                                 self.dropout, self.ffn_mode,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"layer{i}")
            x = run(layer, x, mask)
        return x


class Decoder(nn.Module):
    """Embedding prologue + N x DecoderLayer + vocab-logits dense
    (reference Decoder, modules.py:513-552). `apply_final` lets the greedy
    decoder skip the (B,L,22234) projection and apply it to a single
    position instead (setup-style so `final_projection` is independently
    callable)."""

    num_layers: int
    d_model: int
    num_heads: int
    dff: int
    vocab_size: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    max_position: int = 512
    tie_embeddings: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = TokenEmbed(self.vocab_size, self.d_model, self.dropout,
                                self.max_position, self.dtype,
                                self.param_dtype)
        self.layers = [
            DecoderLayer(self.d_model, self.num_heads, self.dff,
                         self.dropout, self.ffn_mode, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        # logits computed in f32: the 22k-way softmax/CE wants full precision
        if self.tie_embeddings:
            # weight tying (an extension beyond the reference recipe): the
            # output projection reuses the decoder embedding table, so every
            # vocab row has a trained direction even for tokens the training
            # set never contains — decisive at the 6.6k-sentence data scale
            # this environment caps us at (see RESULTS.md). Only a per-token
            # bias is learned on the output side.
            self.final_bias = self.param("final_bias", nn.initializers.zeros,
                                         (self.vocab_size,), self.param_dtype)
        else:
            self.final_layer = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                        param_dtype=self.param_dtype)

    def __call__(self, tokens, enc_output, look_ahead_mask, padding_mask,
                 *, deterministic: bool = True, apply_final: bool = True):
        x = self.embed(tokens, deterministic=deterministic)
        run = _maybe_remat(
            lambda mdl, x, mem, lam, pm: mdl(
                x, mem, lam, pm, deterministic=deterministic),
            self.remat)
        for layer in self.layers:
            x = run(layer, x, enc_output, look_ahead_mask, padding_mask)
        if apply_final:
            x = self.final_projection(x)
        return x

    def final_projection(self, x):
        if self.tie_embeddings:
            E = self.embed.table().astype(jnp.float32)
            return x.astype(jnp.float32) @ E.T + self.final_bias.astype(
                jnp.float32)
        return self.final_layer(x)
