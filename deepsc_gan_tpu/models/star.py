"""Star-Transformer semantic codec (ring + relay message passing).

Behavioral spec from the reference (`DeepSC-GAN/models/modules.py:126-387,
554-718`): per cycle, each satellite node h_i attends over a 5-entry context
[h_{i-1}, h_i, h_{i+1}, e_i, s] (ReLU on the attention output), then the
relay node s attends over [s; h] (encoder) or [s; h; h2] (decoder, where h2
is the masked target self-attention output). After `cycle_num` cycles:
residual + LayerNorm + FFN, with the exact (quirky) LayerNorm-sharing of
each reference class preserved:

- `StarTransformerEncoderLayer` / `StarTransformerDecoderLayer`
  (modules.py:126-253): relay attention REUSES the satellite attention
  weights (the separate `multi_att_relay` is allocated but unused,
  modules.py:175,243); the decoder reuses `layernorm1` for both the target
  branch and the output residual.
- `STE` / `STD` (modules.py:256-387): separate relay weights actually used;
  STE reuses `layernorm1` for both the residual and the FFN output.

TPU-first design: instead of materializing the reference's (B*L, 5, d)
context tensor (reshape-concat of 5 broadcast tensors, modules.py:163-166),
the satellite update exploits two facts:
  (1) roll commutes with the position-wise K/V projections, so K/V are
      computed ONCE on h and rolled (3 projections instead of 5);
  (2) each query attends to exactly 5 keys, so the score tensor is a dense
      (B, L, H, 5) array built from elementwise dot products — no gather,
      no ragged attention, everything lane-aligned for the VPU with the
      projections left as large MXU matmuls.
A fused Pallas kernel for the cycle body lives in ops/pallas/star.py; this
module is the XLA reference implementation it is tested against.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepsc_gan_tpu.models.transformer import FeedForward, TokenEmbed


class StarAttention(nn.Module):
    """The shared Q/K/V/out projection bank used by both the satellite and
    relay updates (mirrors one reference `sublayer1` instance)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        from deepsc_gan_tpu.ops.attention import ProjKernel

        depth = self.d_model // self.num_heads
        shape = (self.d_model, self.num_heads, depth)
        # bare kernels under the same `wq/wk/wv -> kernel` paths a bias-free
        # DenseGeneral would declare (ops/attention.py:ProjKernel), so the
        # projections can be packed into one MXU matmul under
        # set_qkv_fusion without changing the param tree
        self.wq = ProjKernel(shape, self.param_dtype)
        self.wk = ProjKernel(shape, self.param_dtype)
        self.wv = ProjKernel(shape, self.param_dtype)
        self.out = nn.DenseGeneral(
            features=self.d_model, axis=(-2, -1), use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out")
        self.depth = depth

    # projection helpers (the old DenseGeneral callables); under qkv fusion
    # the _kv/_qkv variants trace as ONE packed matmul
    def _q(self, x):
        from deepsc_gan_tpu.ops.attention import project
        return project(x, self.wq(), self.dtype)

    def _kv(self, x):
        from deepsc_gan_tpu.ops.attention import (project, project_packed,
                                                  qkv_fusion)
        if qkv_fusion():
            return project_packed(x, (self.wk(), self.wv()), self.dtype)
        return (project(x, self.wk(), self.dtype),
                project(x, self.wv(), self.dtype))

    def _qkv(self, x):
        from deepsc_gan_tpu.ops.attention import (project, project_packed,
                                                  qkv_fusion)
        if qkv_fusion():
            return project_packed(
                x, (self.wq(), self.wk(), self.wv()), self.dtype)
        return (project(x, self.wq(), self.dtype),
                project(x, self.wk(), self.dtype),
                project(x, self.wv(), self.dtype))

    def satellite(self, h, e, s):
        """One ring update: each h_i attends over
        {h_{i+1}, h_i, h_{i-1}, e_i, s}. h,e: (B,L,D); s: (B,D) -> (B,L,D).
        ReLU is applied by the caller (reference modules.py:170).

        K/V are projected ONCE on h and rolled (roll commutes with the
        position-wise projections — 3 projections instead of 5), then the
        5-context attention runs through the fused Pallas kernel on TPU
        (ops/pallas/star.py; XLA fallback elsewhere). The `_sharded` entry
        is identical single-device; inside a GSPMD mesh step it nests a
        shard_map over the registered batch axis (set_star_kernel_mesh)
        so the Mosaic custom call partitions cleanly."""
        from deepsc_gan_tpu.ops.pallas.star import (
            star_satellite_attention_sharded as star_satellite_attention,
        )

        b, l, d = h.shape
        flat = lambda t: t.reshape(t.shape[0], t.shape[1], d)
        qh3, kh3, vh3 = self._qkv(h)  # one packed matmul under qkv fusion
        q, kh, vh = flat(qh3), flat(kh3), flat(vh3)   # (B,L,D)
        ke3, ve3 = self._kv(e)
        ke, ve = flat(ke3), flat(ve3)
        ks3, vs3 = self._kv(s)
        ks = ks3.reshape(b, 1, d)                 # (B,1,D)
        vs = vs3.reshape(b, 1, d)

        # neighbors: reference cycle_shift uses tf.roll(+-1) on axis 1
        nxt = lambda t: jnp.roll(t, -1, axis=1)
        prv = lambda t: jnp.roll(t, 1, axis=1)
        k_ctx = jnp.stack(
            [nxt(kh), kh, prv(kh), ke, jnp.broadcast_to(ks, (b, l, d))])
        v_ctx = jnp.stack(
            [nxt(vh), vh, prv(vh), ve, jnp.broadcast_to(vs, (b, l, d))])

        out = star_satellite_attention(q, k_ctx, v_ctx, self.num_heads)
        return self.out(out.reshape(b, l, self.num_heads, self.depth))

    def relay(self, s, h, h2: Optional[jnp.ndarray] = None):
        """Relay update: s attends over [s; h] (+ h2 for the decoder).
        s: (B,D) -> (B,D). ReLU applied by the caller."""
        ctx = [s[:, None, :], h] + ([h2] if h2 is not None else [])
        m_c = jnp.concatenate(ctx, axis=1)   # (B, 1+L(+Lt), D)
        q = self._q(s[:, None, :])           # (B,1,H,dh)
        k, v = self._kv(m_c)
        scale = jnp.sqrt(jnp.asarray(self.depth, jnp.float32))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / scale
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return self.out(out)[:, 0, :]        # (B,D)

    def full(self, q, k, v, mask):
        """Plain MHA through the same weights (used for the decoder's
        masked target self-attention, reference `multi_tar`)."""
        if q is k and k is v:
            qh, kh, vh = self._qkv(q)
        else:
            qh = self._q(q)
            if k is v:
                kh, vh = self._kv(k)
            else:
                from deepsc_gan_tpu.ops.attention import project
                kh = project(k, self.wk(), self.dtype)
                vh = project(v, self.wv(), self.dtype)
        scale = jnp.sqrt(jnp.asarray(self.depth, jnp.float32))
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) / scale
        if mask is not None:
            logits = logits + mask.astype(jnp.float32) * -1e9
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
        return self.out(out)

    def __call__(self, q, k, v, mask=None):
        return self.full(q, k, v, mask)


def _star_cycles(att_sat: StarAttention, att_relay: StarAttention,
                 e, h2: Optional[jnp.ndarray], cycle_num: int):
    """Run `cycle_num` ring+relay cycles. Weights are identical across
    cycles, so the loop is a `lax.scan`-shaped recurrence; with cycle_num=8
    and tiny per-cycle cost we unroll in Python for XLA to pipeline."""
    h = e
    s = jnp.mean(h, axis=1)  # (B,D)
    for _ in range(cycle_num):
        h = nn.relu(att_sat.satellite(h, e, s))
        s = nn.relu(att_relay.relay(s, h, h2))
    return h, s


class StarEncoderLayer(nn.Module):
    """Reference `StarTransformerEncoderLayer` (modules.py:126-186) when
    separate_relay=False, `STE` (modules.py:256-320) when True."""

    cycle_num: int
    d_model: int
    num_heads: int
    dff: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    separate_relay: bool = False
    share_ffn_ln: bool = False  # STE reuses layernorm1 for the FFN output
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.att_satellite = StarAttention(self.d_model, self.num_heads, **kw)
        if self.separate_relay:
            self.att_relay = StarAttention(self.d_model, self.num_heads, **kw)
        self.sl2 = FeedForward(self.d_model, self.dff, self.ffn_mode, **kw)
        self.layernorm1 = nn.LayerNorm(epsilon=1e-6, **kw)
        self.layernorm2 = nn.LayerNorm(epsilon=1e-6, **kw)
        self.dropout1 = nn.Dropout(self.dropout)
        self.dropout2 = nn.Dropout(self.dropout)

    def __call__(self, e, *, deterministic: bool):
        # quirk kept: the multi-layer reference classes REUSE the satellite
        # attention weights for the relay update (modules.py:175)
        relay = self.att_relay if self.separate_relay else self.att_satellite
        h, s = _star_cycles(self.att_satellite, relay, e, None,
                            self.cycle_num)
        attn_output = self.dropout1(h, deterministic=deterministic)
        output1 = self.layernorm1(e + attn_output)
        ffn_output = self.sl2(output1)
        ffn_output = self.dropout2(ffn_output, deterministic=deterministic)
        ln_out = self.layernorm1 if self.share_ffn_ln else self.layernorm2
        return ln_out(output1 + ffn_output), s


class StarDecoderLayer(nn.Module):
    """Reference `StarTransformerDecoderLayer` (modules.py:188-253) when
    separate_relay=False, `STD` (modules.py:322-387) when True. The target
    stream enters only through the relay context [s; h; h2]."""

    cycle_num: int
    d_model: int
    num_heads: int
    dff: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    separate_relay: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.multi_tar = StarAttention(self.d_model, self.num_heads, **kw)
        self.att_satellite = StarAttention(self.d_model, self.num_heads, **kw)
        if self.separate_relay:
            self.att_relay = StarAttention(self.d_model, self.num_heads, **kw)
        self.sl2 = FeedForward(self.d_model, self.dff, self.ffn_mode, **kw)
        self.layernorm1 = nn.LayerNorm(epsilon=1e-6, **kw)
        self.layernorm2 = nn.LayerNorm(epsilon=1e-6, **kw)
        self.layernorm3 = nn.LayerNorm(epsilon=1e-6, **kw)
        self.dropout1 = nn.Dropout(self.dropout)
        self.dropout2 = nn.Dropout(self.dropout)
        self.dropout3 = nn.Dropout(self.dropout)

    def __call__(self, tar, e, look_ahead_mask, *, deterministic: bool):
        attn1 = self.multi_tar(tar, tar, tar, look_ahead_mask)
        attn1 = self.dropout1(attn1, deterministic=deterministic)
        h2 = self.layernorm1(tar + attn1)

        relay = self.att_relay if self.separate_relay else self.att_satellite
        h, s = _star_cycles(self.att_satellite, relay, e, h2,
                            self.cycle_num)
        attn_output = self.dropout2(h, deterministic=deterministic)
        # reference StarTransformerDecoderLayer reuses layernorm1 here
        # (modules.py:247); STD uses layernorm2 (modules.py:382)
        ln_res = self.layernorm2 if self.separate_relay else self.layernorm1
        output1 = ln_res(e + attn_output)
        ffn_output = self.sl2(output1)
        ffn_output = self.dropout3(ffn_output, deterministic=deterministic)
        ln_out = self.layernorm3 if self.separate_relay else self.layernorm2
        return ln_out(output1 + ffn_output), s


class SEncoder(nn.Module):
    """Multi-layer star encoder (reference SEncoder, modules.py:554-590)."""

    cycle_num: int
    num_layers: int
    num_heads: int
    d_model: int
    dff: int
    vocab_size: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    max_position: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask=None, *, deterministic: bool = True):
        x = TokenEmbed(self.vocab_size, self.d_model, self.dropout,
                       self.max_position, self.dtype, self.param_dtype,
                       name="embed")(tokens, deterministic=deterministic)
        for i in range(self.num_layers):
            x, _ = StarEncoderLayer(
                self.cycle_num, self.d_model, self.num_heads, self.dff,
                self.dropout, self.ffn_mode, separate_relay=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer{i}")(x, deterministic=deterministic)
        return x


class SDecoder(nn.Module):
    """Multi-layer star decoder + vocab dense (reference SDecoder,
    modules.py:592-633). NOTE: output length equals the MEMORY length (the
    star cycles update the received signal e, not the target stream)."""

    cycle_num: int
    num_layers: int
    d_model: int
    num_heads: int
    dff: int
    vocab_size: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    max_position: int = 512
    tie_embeddings: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = TokenEmbed(self.vocab_size, self.d_model, self.dropout,
                                self.max_position, self.dtype,
                                self.param_dtype)
        self.layers = [
            StarDecoderLayer(
                self.cycle_num, self.d_model, self.num_heads, self.dff,
                self.dropout, self.ffn_mode, separate_relay=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        if self.tie_embeddings:
            # weight tying with the decoder embedding (see
            # models/transformer.py Decoder.setup for rationale)
            self.final_bias = self.param("final_bias", nn.initializers.zeros,
                                         (self.vocab_size,), self.param_dtype)
        else:
            self.final_layer = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                        param_dtype=self.param_dtype)

    def __call__(self, tar, x, look_ahead_mask, padding_mask=None,
                 *, deterministic: bool = True, apply_final: bool = True):
        tar = self.embed(tar, deterministic=deterministic)
        for layer in self.layers:
            x, _ = layer(tar, x, look_ahead_mask,
                         deterministic=deterministic)
        if apply_final:
            x = self.final_projection(x)
        return x

    def final_projection(self, x):
        if self.tie_embeddings:
            E = self.embed.table().astype(jnp.float32)
            return x.astype(jnp.float32) @ E.T + self.final_bias.astype(
                jnp.float32)
        return self.final_layer(x)


class SE(nn.Module):
    """Single-block star encoder (reference SE, modules.py:635-674) — the
    variant the committed reference checkpoints contain."""

    cycle_num: int
    num_heads: int
    d_model: int
    dff: int
    vocab_size: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    max_position: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask=None, *, deterministic: bool = True):
        x = TokenEmbed(self.vocab_size, self.d_model, self.dropout,
                       self.max_position, self.dtype, self.param_dtype,
                       name="embed")(tokens, deterministic=deterministic)
        x, _ = StarEncoderLayer(
            self.cycle_num, self.d_model, self.num_heads, self.dff,
            self.dropout, self.ffn_mode, separate_relay=True,
            share_ffn_ln=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="block")(
            x, deterministic=deterministic)
        return x


class SD(nn.Module):
    """Single-block star decoder + vocab dense (reference SD,
    modules.py:677-718)."""

    cycle_num: int
    d_model: int
    num_heads: int
    dff: int
    vocab_size: int
    dropout: float = 0.1
    ffn_mode: str = "mlp"
    max_position: int = 512
    tie_embeddings: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = TokenEmbed(self.vocab_size, self.d_model, self.dropout,
                                self.max_position, self.dtype,
                                self.param_dtype)
        self.block = StarDecoderLayer(
            self.cycle_num, self.d_model, self.num_heads, self.dff,
            self.dropout, self.ffn_mode, separate_relay=True,
            dtype=self.dtype, param_dtype=self.param_dtype)
        if self.tie_embeddings:
            # weight tying with the decoder embedding (see
            # models/transformer.py Decoder.setup for rationale)
            self.final_bias = self.param("final_bias", nn.initializers.zeros,
                                         (self.vocab_size,), self.param_dtype)
        else:
            self.final_layer = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                        param_dtype=self.param_dtype)

    def __call__(self, tar, x, look_ahead_mask, padding_mask=None,
                 *, deterministic: bool = True, apply_final: bool = True):
        tar = self.embed(tar, deterministic=deterministic)
        x, _ = self.block(tar, x, look_ahead_mask,
                          deterministic=deterministic)
        if apply_final:
            x = self.final_projection(x)
        return x

    def final_projection(self, x):
        if self.tie_embeddings:
            E = self.embed.table().astype(jnp.float32)
            return x.astype(jnp.float32) @ E.T + self.final_bias.astype(
                jnp.float32)
        return self.final_layer(x)
