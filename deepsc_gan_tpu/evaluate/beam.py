"""Beam-search decoding (framework extension — the reference only ships
greedy decoders, utlis/eval.py; beam search is the standard upgrade for
serving quality).

TPU-first design: like evaluate/greedy.py, the whole search is ONE jitted
`lax.fori_loop` over fixed-shape state — beams are an extra leading-
batched axis folded into the batch for the decoder call, so every step is
the same compiled program:

  state per step: tokens (B, K, T+1), cumulative log-probs (B, K),
                  finished flags (B, K)
  step i: decode all B*K prefixes -> log-softmax at position i ->
          top-k over (K * V) continuations per batch row -> gather
          the surviving prefixes.

Two implementations:
  - `make_beam_decode`     — full-prefix decode per step (the O(L^2)
                             reference pattern; kept as the equivalence
                             oracle for tests);
  - `make_beam_decode_kv`  — the serving path: per-layer incremental K/V
                             caches (evaluate/kv_decode.py), one position
                             through the stack per step, with the caches
                             GATHERED along the beam axis when beams are
                             reordered by top-k. Token-identical to the
                             full-prefix beam at float32 (tested).

Finished beams (emitted <END>) are frozen: they propose exactly one
continuation (PAD) carrying their score, so they compete with live beams
in the joint top-k — standard length-preserving beam semantics. Scores
use pure sum of log-probs (no length normalization), so beam_size=1
reproduces greedy argmax token-for-token.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from deepsc_gan_tpu.ops.masks import create_look_ahead_mask, create_padding_mask
from deepsc_gan_tpu.ops.positional import positional_encoding
from deepsc_gan_tpu.utils.config import Config

NEG = -1e9


def _exact_topk(x: jnp.ndarray, k: int):
    """Exact top-k over the last axis of (B, N) via k masked-argmax
    passes. At N=K*V~89k `lax.top_k` is fast in isolation (~20 us) but
    fuses worse inside the decode loop: masked argmax measured ~5%
    faster end-to-end (23.6 vs 24.9 ms at B=64) — the big win in this
    loop is the one-hot cache permutation below, not the top-k. Returns
    (values (B, k), indices (B, k)), ordered like lax.top_k — descending,
    ties broken by lowest index (argmax picks the first occurrence, and
    masking removes it before the next pass)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = jnp.zeros(x.shape, bool)
    vals, idxs = [], []
    for _ in range(k):
        xm = jnp.where(mask, NEG, x)
        i = jnp.argmax(xm, axis=-1)
        vals.append(jnp.max(xm, axis=-1))
        idxs.append(i.astype(jnp.int32))
        mask = mask | (iota == i[:, None])
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def make_beam_decode(model, cfg: Config, beam_size: int = 4,
                     channel_kind: Optional[str] = None) -> Callable:
    """Beam search for the autoregressive (vanilla transformer) decoder.
    Returns jitted `decode(params, inp, key, pnr_db, n_std) ->
    (B, max_length+1) ids` (best beam)."""
    kind = channel_kind or cfg.channel
    K = beam_size
    T = cfg.max_length

    @jax.jit
    def decode(params, inp, key, pnr_db, n_std):
        bsz = inp.shape[0]
        enc_padding_mask = create_padding_mask(inp, cfg.pad_idx)
        tx = model.apply({"params": params}, inp, enc_padding_mask,
                         deterministic=True, method="encode")
        y = model.apply({"params": params}, key, tx, jnp.zeros_like(tx),
                        pnr_db, n_std, kind, method="transmit")
        mem = model.apply({"params": params}, y, method="channel_decode")

        # beams fold into the batch axis for the decoder
        mem_k = jnp.repeat(mem, K, axis=0)                  # (B*K, L, D)
        enc_mask_k = jnp.repeat(enc_padding_mask, K, axis=0)
        causal = create_look_ahead_mask(T + 1)

        tokens = jnp.full((bsz, K, T + 1), cfg.pad_idx, jnp.int32)
        tokens = tokens.at[:, :, 0].set(cfg.start_idx)
        # only beam 0 live at step 0 (identical prefixes must not multiply)
        scores = jnp.full((bsz, K), NEG, jnp.float32).at[:, 0].set(0.0)
        finished = jnp.zeros((bsz, K), bool)

        def body(i, carry):
            tokens, scores, finished = carry
            flat = tokens.reshape(bsz * K, T + 1)
            pad_mask = create_padding_mask(flat, cfg.pad_idx)
            combined = jnp.maximum(pad_mask, causal)
            h = model.apply({"params": params}, flat, mem_k, combined,
                            enc_mask_k, deterministic=True,
                            apply_final=False, method="_semantic_decode")
            h_i = jax.lax.dynamic_index_in_dim(h, i, axis=1, keepdims=False)
            logits = model.apply({"params": params}, h_i[:, None, :],
                                 method="final_projection")[:, 0]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(bsz, K, -1)                 # (B, K, V)

            # finished beams propose exactly one frozen continuation (PAD)
            frozen = jnp.full_like(logp, NEG).at[:, :, cfg.pad_idx].set(0.0)
            logp = jnp.where(finished[:, :, None], frozen, logp)

            cand = scores[:, :, None] + logp                # (B, K, V)
            v = cand.shape[-1]
            top_scores, top_idx = _exact_topk(
                cand.reshape(bsz, K * v), K)                # (B, K)
            src_beam = top_idx // v
            next_tok = (top_idx % v).astype(jnp.int32)

            tokens = jnp.take_along_axis(
                tokens, src_beam[:, :, None], axis=1)
            tokens = tokens.at[:, :, i + 1].set(next_tok)
            finished = jnp.take_along_axis(finished, src_beam, axis=1)
            finished = finished | (next_tok == cfg.end_idx)
            return tokens, top_scores, finished

        tokens, scores, _ = jax.lax.fori_loop(
            0, T, body, (tokens, scores, finished))
        best = jnp.argmax(scores, axis=1)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]

    return decode


def make_beam_decode_kv(model, cfg: Config, beam_size: int = 4,
                        channel_kind: Optional[str] = None) -> Callable:
    """KV-cached beam search (the serving path): beams fold into the
    batch axis of the incremental per-layer caches, each step computes ONE
    position through the stack, and the caches are gathered by the
    surviving-beam indices after every top-k. O(L) stack passes total vs
    the full-prefix beam's O(L^2) (evaluate/kv_decode.py design notes).
    Vanilla transformer variant only. Returns jitted
    `decode(params, inp, key, pnr_db, n_std) -> (B, max_length+1) ids`
    (best beam) — token-identical to make_beam_decode at float32."""
    from deepsc_gan_tpu.evaluate.kv_decode import (
        _attend,
        _attn_out,
        _kv_memory,
        _ln,
        _qkv,
    )

    kind = channel_kind or cfg.channel
    dtype = jnp.dtype(cfg.dtype)
    K = beam_size
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
        y = model.apply({"params": params}, key, tx, jnp.zeros_like(tx),
                        pnr_db, n_std, kind, method="transmit")
        mem = model.apply({"params": params}, y,
                          method="channel_decode").astype(dtype)

        dec = params["semantic_decoder"]
        layers = [dec[f"layer{i}"] for i in range(n_layers)]
        E = dec["embed"]["embedding"]["embedding"]
        pe = positional_encoding(512, cfg.decoder_d_model, dtype)[0]

        # memory K/V + cross bias computed once, beams folded into batch
        mem_k = jnp.repeat(mem, K, axis=0)                  # (B*K, Lm, D)
        memKV = [_kv_memory(l["cross_mha"], mem_k) for l in layers]
        cross_bias = jnp.repeat(
            enc_padding_mask[:, :, 0, :].astype(jnp.float32) * NEG,
            K, axis=0)                                      # (B*K, 1, Lm)

        if "final_layer" in dec:
            Wf = dec["final_layer"]["kernel"].astype(jnp.float32)
            bf = dec["final_layer"]["bias"].astype(jnp.float32)
        else:  # tied embeddings
            Wf = E.T.astype(jnp.float32)
            bf = dec["final_bias"].astype(jnp.float32)

        tokens = jnp.full((B, K, T + 1), cfg.pad_idx, jnp.int32)
        tokens = tokens.at[:, :, 0].set(cfg.start_idx)
        scores = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
        finished = jnp.zeros((B, K), bool)
        caches = tuple(
            (jnp.zeros((B * K, T + 1, H, Dh), dtype),
             jnp.zeros((B * K, T + 1, H, Dh), dtype))
            for _ in range(n_layers))
        positions = jnp.arange(T + 1)

        def body(i, carry):
            tokens, scores, finished, caches = carry
            flat = tokens.reshape(B * K, T + 1)
            tok = jax.lax.dynamic_index_in_dim(flat, i, axis=1,
                                               keepdims=False)
            x = E[tok].astype(dtype) * sqrt_d + pe[i].astype(dtype)

            # keys blocked when causal-future OR emitted token is <PAD>
            # (parity with the full-prefix combined mask)
            blocked = (positions[None, :] > i) | (flat == cfg.pad_idx)
            self_bias = jnp.where(blocked, NEG, 0.0)[:, None, :]

            new_caches = []
            for l, (Kc, Vc), (Km, Vm) in zip(layers, caches, memKV):
                p = l["self_mha"]
                qi = _qkv(p["wq"], x)
                ki = _qkv(p["wk"], x)
                vi = _qkv(p["wv"], x)
                Kc = jax.lax.dynamic_update_index_in_dim(Kc, ki, i, axis=1)
                Vc = jax.lax.dynamic_update_index_in_dim(Vc, vi, i, axis=1)
                attn = _attn_out(p, _attend(qi, Kc, Vc, self_bias))
                out1 = _ln(l["ln1"], x + attn).astype(dtype)

                p2 = l["cross_mha"]
                q2 = _qkv(p2["wq"], out1)
                attn2 = _attn_out(p2, _attend(q2, Km, Vm, cross_bias))
                out2 = _ln(l["ln2"], attn2 + out1).astype(dtype)

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

            logits = x.astype(jnp.float32) @ Wf + bf        # (B*K, V)
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, -1)

            frozen = jnp.full_like(logp, NEG).at[:, :, cfg.pad_idx].set(0.0)
            logp = jnp.where(finished[:, :, None], frozen, logp)

            cand = scores[:, :, None] + logp                # (B, K, V)
            v = cand.shape[-1]
            top_scores, top_idx = _exact_topk(
                cand.reshape(B, K * v), K)
            src_beam = top_idx // v                         # (B, K)
            next_tok = (top_idx % v).astype(jnp.int32)

            tokens = jnp.take_along_axis(tokens, src_beam[:, :, None],
                                         axis=1)
            tokens = tokens.at[:, :, i + 1].set(next_tok)
            finished = jnp.take_along_axis(finished, src_beam, axis=1)
            finished = finished | (next_tok == cfg.end_idx)

            # Reorder the caches to follow the surviving beams — as a
            # ONE-HOT MATMUL permutation along the folded (B*K) axis.
            # Any index-based gather (take / take_along_axis) lowers to an
            # elementwise dynamic-gather that XLA cannot tile inside this
            # loop: measured ~68 ms of a 94 ms beam search (~4x the whole
            # search) for what is 16 MB of cache movement. The 0/1 matmul
            # rides the MXU instead (exact: one term per output row) —
            # measured 95 -> 24 ms end-to-end at B=64, K=4.
            flat_src = (jnp.arange(B, dtype=src_beam.dtype)[:, None] * K
                        + src_beam).reshape(B * K)
            onehot = jax.nn.one_hot(flat_src, B * K, dtype=dtype)
            gathered = tuple(
                (jnp.einsum("ij,j...->i...", onehot, Kc),
                 jnp.einsum("ij,j...->i...", onehot, Vc))
                for Kc, Vc in new_caches)
            return tokens, top_scores, finished, gathered

        tokens, scores, _, _ = jax.lax.fori_loop(
            0, T, body, (tokens, scores, finished, caches))
        best = jnp.argmax(scores, axis=1)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]

    return jax.jit(decode)


def make_beam_decode_sweep(model, cfg: Config, beam_size: int = 4,
                           channel_kind: Optional[str] = None) -> Callable:
    """KV-cached beam search across a VECTOR of noise levels in one jitted
    call (mirrors evaluate.greedy.make_greedy_decode_sweep):
    `sweep(params, inp, key, pnr_db, n_stds[S]) -> (S, B, T+1) ids`."""
    decode = make_beam_decode_kv(model, cfg, beam_size, channel_kind)
    inner = decode.__wrapped__

    @jax.jit
    def sweep(params, inp, key, pnr_db, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return jax.vmap(inner, in_axes=(None, None, 0, None, 0))(
            params, inp, keys, pnr_db, n_stds)

    return sweep
