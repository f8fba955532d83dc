"""KV-cached greedy decode for the vanilla transceiver.

SURVEY.md §7 hard-part (d): the reference's greedy decode re-runs the
FULL decoder over the growing prefix every step (`utlis/eval.py:99-115`),
and round-1's fori_loop decode kept that O(L^2)-per-token recompute
(evaluate/greedy.py). This module is the cache-correct version: per-layer
self-attention K/V buffers are filled incrementally, cross-attention K/V
against the channel-decoded memory are projected ONCE, and each step
computes exactly one position through the stack — O(L) total projections
instead of O(L^2).

Implemented as pure functions over the parameter tree (the flax module's
param names are a stable public layout: self_mha/cross_mha {wq,wk,wv,out},
ln1/ln2/ln3, ffn fc1/fc2 — models/transformer.py). The whole decode is one
jitted fori_loop, like evaluate/greedy.py.

Token parity: attention over the cached prefix computes the same rows as
masked attention over the zero-padded fixed buffer, so at float32 the
emitted tokens match evaluate/greedy.py exactly (tested); at bfloat16
reduction orders may differ in the last bit and argmax ties can flip.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from deepsc_gan_tpu.ops.masks import create_padding_mask
from deepsc_gan_tpu.ops.positional import positional_encoding
from deepsc_gan_tpu.train.steps import _final_wb
from deepsc_gan_tpu.utils.config import Config

NEG = -1e9


def _ln(p, x, eps=1e-6):
    # flax LayerNorm semantics: statistics in f32, scale+bias
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _qkv(p, x):
    """x: (B, D) -> (B, H, Dh) through a DenseGeneral (D, H, Dh) kernel."""
    return jnp.einsum("bd,dhk->bhk", x, p["kernel"].astype(x.dtype))


def _kv_memory(p, mem):
    """mem: (B, Lm, D) -> K,V (B, Lm, H, Dh) — projected once. This is
    the same buffer form as the incremental self-attention caches, so
    every `_attend` in the greedy loop runs on ONE form and XLA picks a
    single stable layout. The beam path uses `_kv_memory_t` instead."""
    K = jnp.einsum("bld,dhk->blhk", mem, p["wk"]["kernel"].astype(mem.dtype))
    V = jnp.einsum("bld,dhk->blhk", mem, p["wv"]["kernel"].astype(mem.dtype))
    return K, V


def _kv_memory_t(p, mem):
    """mem: (B, Lm, D) -> K (B, H, Dh, Lm), V (B, H, Lm, Dh) — projected
    once, pre-transposed for the beam path's shared-memory cross-attention
    (`beam.py:_x_attend`), whose contractions keep the beam axis free. In
    the beam program the beam-expanded `blhk` form let XLA pick a
    per-step layout that collapsed at Lm=32 (measured end-to-end: 5,054
    seq/s at Lm=31 -> 3,901 at Lm=32, v5e); this form is layout-stable at
    either length and faster at both (5,809 / 5,936 — RESULTS.md
    "Beam-4 serving")."""
    K = jnp.einsum("bld,dhk->bhkl", mem, p["wk"]["kernel"].astype(mem.dtype))
    V = jnp.einsum("bld,dhk->bhlk", mem, p["wv"]["kernel"].astype(mem.dtype))
    return K, V


def _attn_out(p, ctx):
    """ctx: (B, H, Dh) -> (B, D) through the (H, Dh, D) output kernel."""
    o = jnp.einsum("bhk,hkd->bd", ctx, p["out"]["kernel"].astype(ctx.dtype))
    return o + p["out"]["bias"].astype(ctx.dtype)


def _attend(q, K, V, bias):
    """q: (B,H,Dh); K/V: (B,L,H,Dh); bias: broadcastable to (B,H,L)."""
    depth = q.shape[-1]
    logits = jnp.einsum("bhk,blhk->bhl", q, K).astype(jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(depth, jnp.float32)) + bias
    w = jax.nn.softmax(logits, axis=-1).astype(V.dtype)
    return jnp.einsum("bhl,blhk->bhk", w, V)


def make_greedy_decode_kv(model, cfg: Config,
                          channel_kind: Optional[str] = None,
                          jit: bool = True) -> Callable:
    """KV-cached greedy decode, drop-in for
    evaluate.greedy.make_greedy_decode (vanilla transformer variant only —
    star decoders are non-autoregressive there, use position_mode
    "oneshot"). Returns
    `decode(params, inp, key, pnr_db, n_std) -> (B, max_length+1) ids`,
    jitted unless `jit=False` (sweep/parallel makers compose the raw
    decode under their own jit/vmap/shard_map)."""
    kind = channel_kind or cfg.channel
    dtype = jnp.dtype(cfg.dtype)
    T = cfg.max_length
    n_layers = cfg.decoder_num_layer
    H = cfg.decoder_num_heads
    Dh = cfg.decoder_d_model // H
    sqrt_d = jnp.sqrt(jnp.asarray(cfg.decoder_d_model, dtype))

    def decode(params, inp, key, pnr_db, n_std):
        B = inp.shape[0]
        enc_padding_mask = create_padding_mask(inp, cfg.pad_idx)
        tx = model.apply({"params": params}, inp, enc_padding_mask,
                         deterministic=True, method="encode")
        y = model.apply({"params": params}, key, tx,
                        jnp.zeros_like(tx), pnr_db, n_std, kind,
                        method="transmit")
        mem = model.apply({"params": params}, y,
                          method="channel_decode").astype(dtype)

        dec = params["semantic_decoder"]
        layers = [dec[f"layer{i}"] for i in range(n_layers)]
        E = dec["embed"]["embedding"]["embedding"]
        # PE rows are independent of table length; size from the config so
        # max_length > 511 can never silently run off the table
        pe = positional_encoding(max(512, cfg.max_length + 2),
                                 cfg.decoder_d_model, dtype)[0]

        # cross-attention K/V and bias: computed once
        memKV = [_kv_memory(l["cross_mha"], mem) for l in layers]
        # enc_padding_mask: (B,1,1,Lm), 1.0 = blocked -> (B,1,Lm) bias
        cross_bias = enc_padding_mask[:, :, 0, :].astype(jnp.float32) * NEG

        Wf, bf = _final_wb(params)  # train.steps: tied/untied layouts
        Wf, bf = Wf.astype(jnp.float32), bf.astype(jnp.float32)

        buf = jnp.full((B, T + 1), cfg.pad_idx, jnp.int32)
        buf = buf.at[:, 0].set(cfg.start_idx)
        caches = [(jnp.zeros((B, T + 1, H, Dh), dtype),
                   jnp.zeros((B, T + 1, H, Dh), dtype))
                  for _ in range(n_layers)]
        positions = jnp.arange(T + 1)

        def body(i, carry):
            buf, caches = carry
            tok = jax.lax.dynamic_index_in_dim(buf, i, axis=1,
                                               keepdims=False)
            x = E[tok].astype(dtype) * sqrt_d + pe[i].astype(dtype)

            # parity with the buffer path's combined mask: keys are blocked
            # when causal-future OR when the emitted token there is <PAD>
            # (greedy.py builds max(pad_mask(buf), causal) each step)
            blocked = (positions[None, :] > i) | (buf == cfg.pad_idx)
            self_bias = jnp.where(blocked, NEG, 0.0)[:, None, :]  # (B,1,T+1)

            new_caches = []
            for l, (Kc, Vc), (Km, Vm) in zip(layers, caches, memKV):
                # --- masked self-attention over the cache (causal: only
                # positions <= i are filled; mask the rest)
                p = l["self_mha"]
                qi = _qkv(p["wq"], x)
                ki = _qkv(p["wk"], x)
                vi = _qkv(p["wv"], x)
                Kc = jax.lax.dynamic_update_index_in_dim(Kc, ki, i, axis=1)
                Vc = jax.lax.dynamic_update_index_in_dim(Vc, vi, i, axis=1)
                attn = _attn_out(p, _attend(qi, Kc, Vc, self_bias))
                out1 = _ln(l["ln1"], x + attn).astype(dtype)

                # --- cross-attention against the precomputed memory K/V
                p2 = l["cross_mha"]
                q2 = _qkv(p2["wq"], out1)
                attn2 = _attn_out(p2, _attend(q2, Km, Vm, cross_bias))
                out2 = _ln(l["ln2"], attn2 + out1).astype(dtype)

                # --- FFN (+ identity mode for quirk Q1)
                if cfg.ffn_mode == "identity":
                    ffn = out2
                else:
                    f = l["ffn"]
                    h = jnp.maximum(
                        out2 @ f["fc1"]["kernel"].astype(dtype)
                        + f["fc1"]["bias"].astype(dtype), 0)
                    ffn = (h @ f["fc2"]["kernel"].astype(dtype)
                           + f["fc2"]["bias"].astype(dtype))
                x = _ln(l["ln3"], ffn + out2).astype(dtype)
                new_caches.append((Kc, Vc))

            logits = x.astype(jnp.float32) @ Wf + bf
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return buf.at[:, i + 1].set(nxt), tuple(new_caches)

        buf, _ = jax.lax.fori_loop(0, T, body, (buf, tuple(caches)))
        return buf

    return jax.jit(decode) if jit else decode


def make_greedy_decode_kv_sweep(model, cfg: Config,
                                channel_kind: Optional[str] = None,
                                jit: bool = True) -> Callable:
    """KV-cached decode across a VECTOR of noise levels in one jitted call
    (mirrors evaluate.greedy.make_greedy_decode_sweep):
    `sweep(params, inp, key, pnr_db, n_stds[S]) -> (S, B, T+1) ids`."""
    inner = make_greedy_decode_kv(model, cfg, channel_kind, jit=False)

    def sweep(params, inp, key, pnr_db, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return jax.vmap(inner, in_axes=(None, None, 0, None, 0))(
            params, inp, keys, pnr_db, n_stds)

    return jax.jit(sweep) if jit else sweep
