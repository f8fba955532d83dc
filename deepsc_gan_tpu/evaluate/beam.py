"""Beam-search decoding (framework extension — the reference only ships
greedy decoders, utlis/eval.py; beam search is the standard upgrade for
serving quality).

TPU-first design: like evaluate/greedy.py, the whole search is ONE jitted
`lax.fori_loop` over fixed-shape state — beams are an extra leading-
batched axis folded into the batch for the decoder call, so every step is
the same compiled program:

  state per step: tokens (B, K, T+1), cumulative log-probs (B, K),
                  finished flags (B, K)
  step i: decode all B*K prefixes -> fused top-K candidate scorer
          (ops/pallas/topk.py: vocab projection + per-beam top-K +
          logsumexp, logits never hit HBM) -> top-K over the K*K
          surviving candidates per batch row -> gather the prefixes.

The two-stage selection is exact: any global top-K continuation is
within its beam's top-K over the vocab, candidate values are the same
`score + (logit - lse)` arithmetic on both stages' survivors, and
tie-breaking matches the one-stage (K*V) masked-argmax (lowest flat
beam-major index) because per-beam ranks are ordered by vocab index and
beams compare in beam order.

Two implementations:
  - `make_beam_decode`     — full-prefix decode per step (the O(L^2)
                             reference pattern; kept as the equivalence
                             oracle for tests);
  - `make_beam_decode_kv`  — the serving path: per-layer incremental K/V
                             caches (evaluate/kv_decode.py), one position
                             through the stack per step, caches permuted
                             to follow the surviving beams. Token-
                             identical to the full-prefix beam (tested) —
                             both paths score candidates through the SAME
                             `topk_logits` op, so kernel/XLA numerics
                             cancel in the comparison.

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
from deepsc_gan_tpu.ops.pallas.topk import NEG, _take_top, topk_logits
from deepsc_gan_tpu.ops.positional import positional_encoding
from deepsc_gan_tpu.train.steps import _final_wb
from deepsc_gan_tpu.utils.config import Config


def _frozen_candidates(K: int, pad_idx: int):
    """Per-beam candidate list a FROZEN beam proposes — exactly the
    top-K of the `[logp=0 at PAD, NEG elsewhere]` row the one-stage
    selection saw: (PAD, 0.0) then the K-1 lowest non-PAD vocab ids at
    NEG (masked-argmax tie-break order)."""
    vals = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32),
         jnp.full((K - 1,), NEG, jnp.float32)])
    rest = jnp.arange(1, K)
    rest = jnp.where(rest - 1 < pad_idx, rest - 1, rest)
    idx = jnp.concatenate(
        [jnp.asarray([pad_idx], jnp.int32), rest.astype(jnp.int32)])
    return vals, idx


def _beam_select(h_flat, Wf, bf, scores, finished, K, pad_idx, end_idx):
    """Stage 1: fused per-row top-K + lse over the vocab projection of
    `h_flat` (B*K, D). Stage 2: joint top-K over the K*K candidates per
    batch row. Returns (src_beam (B,K), next_tok (B,K), new_scores,
    new_finished) — `new_finished` is already permuted by src_beam and
    OR-ed with the new end-token hits; callers must NOT re-gather it."""
    B = scores.shape[0]
    vals, idx, lse = topk_logits(h_flat, Wf, bf, K)
    logp = (vals - lse[:, None]).reshape(B, K, K)
    idx = idx.reshape(B, K, K)

    fvals, fidx = _frozen_candidates(K, pad_idx)
    logp = jnp.where(finished[:, :, None], fvals[None, None, :], logp)
    idx = jnp.where(finished[:, :, None], fidx[None, None, :], idx)

    cand = (scores[:, :, None] + logp).reshape(B, K * K)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, K * K), 1)
    top_scores, flat = _take_top(cand, pos, K)
    src_beam = flat // K
    next_tok = jnp.take_along_axis(
        idx.reshape(B, K * K), flat, axis=1).astype(jnp.int32)
    finished = jnp.take_along_axis(finished, src_beam, axis=1)
    finished = finished | (next_tok == end_idx)
    return src_beam, next_tok, top_scores, finished


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
        Wf, bf = _final_wb(params)

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

            src_beam, next_tok, scores, finished = _beam_select(
                h_i, Wf, bf, scores, finished, K, cfg.pad_idx,
                cfg.end_idx)
            tokens = jnp.take_along_axis(
                tokens, src_beam[:, :, None], axis=1)
            tokens = tokens.at[:, :, i + 1].set(next_tok)
            return tokens, scores, finished

        tokens, scores, _ = jax.lax.fori_loop(
            0, T, body, (tokens, scores, finished))
        best = jnp.argmax(scores, axis=1)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]

    return decode


def make_beam_decode_kv(model, cfg: Config, beam_size: int = 4,
                        channel_kind: Optional[str] = None,
                        jit: bool = True) -> Callable:
    """KV-cached beam search (the serving path): beams fold into the
    batch axis of the incremental per-layer caches, each step computes ONE
    position through the stack, and the caches follow the surviving-beam
    permutation after every top-k. O(L) stack passes total vs the
    full-prefix beam's O(L^2) (evaluate/kv_decode.py design notes).
    Vanilla transformer variant only. Returns jitted
    `decode(params, inp, key, pnr_db, n_std) -> (B, max_length+1) ids`
    (best beam) — token-identical to make_beam_decode."""
    from deepsc_gan_tpu.evaluate.kv_decode import (
        _attend,
        _attn_out,
        _kv_memory_t,
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
        # PE rows are independent of table length, so any length >= the
        # decoded positions is value-identical; size it from the config so
        # max_length > 511 can never silently run off the table
        pe = positional_encoding(max(512, cfg.max_length + 2),
                                 cfg.decoder_d_model, dtype)[0]

        # memory K/V + cross bias computed once. Beams from the same batch
        # row share the memory, so it is NOT beam-expanded — the per-step
        # cross-attention streams 1/K of the K/V bytes and contracts the
        # beam dim as a free matmul dim instead (`_x_attend` below).
        memKV = [_kv_memory_t(l["cross_mha"], mem) for l in layers]
        cross_bias = (enc_padding_mask[:, :, 0, :]
                      .astype(jnp.float32) * NEG)[:, None]  # (B, 1, 1, Lm)

        def _x_attend(q, Km, Vm):
            """q: (B*K, H, Dh); Km: (B, H, Dh, Lm); Vm: (B, H, Lm, Dh).
            Same arithmetic as kv_decode._attend_mem with the beam axis
            kept as a free dim of the shared-memory contraction."""
            depth = q.shape[-1]
            qk = q.reshape(B, K, H, Dh)
            lg = jnp.einsum("bjhk,bhkl->bjhl", qk, Km).astype(jnp.float32)
            lg = lg / jnp.sqrt(jnp.asarray(depth, jnp.float32)) + cross_bias
            w = jax.nn.softmax(lg, axis=-1).astype(Vm.dtype)
            out = jnp.einsum("bjhl,bhlk->bjhk", w, Vm)
            return out.reshape(B * K, H, Dh)
        Wf, bf = _final_wb(params)

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
                attn2 = _attn_out(p2, _x_attend(q2, Km, Vm))
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

            src_beam, next_tok, scores, finished = _beam_select(
                x, Wf, bf, scores, finished, K, cfg.pad_idx, cfg.end_idx)
            tokens = jnp.take_along_axis(tokens, src_beam[:, :, None],
                                         axis=1)
            tokens = tokens.at[:, :, i + 1].set(next_tok)

            # Reorder the caches to follow the surviving beams — as a
            # ONE-HOT MATMUL permutation along the folded (B*K) axis.
            # Any index-based gather (take / take_along_axis) lowers to an
            # elementwise dynamic-gather that XLA cannot tile inside this
            # loop: measured ~68 ms of a 94 ms beam search (~4x the whole
            # search) for what is 16 MB of cache movement. The 0/1 matmul
            # rides the MXU instead (exact: one term per output row).
            # NOTE the permutation is block-diagonal (beams only mix
            # within their batch row), but lowering it as a (B, K, K)
            # batched einsum is 20x SLOWER in-loop: XLA pads the tiny
            # 4x4 matmuls to MXU tiles per batch element (measured
            # 1,376 ms vs 60 ms per 19-SNR sweep) — keep the single
            # dense (B*K, B*K) form. Skipping not-yet-written time
            # chunks via lax.cond was also tried and measured SLOWER
            # (3,933 vs 4,990 seq/s end-to-end): the per-chunk branches
            # cost more than the saved traffic.
            flat_src = (jnp.arange(B, dtype=src_beam.dtype)[:, None] * K
                        + src_beam).reshape(B * K)
            onehot = jax.nn.one_hot(flat_src, B * K, dtype=dtype)

            def permuted(c):
                return jnp.einsum("ij,j...->i...", onehot, c)

            gathered = tuple((permuted(Kc), permuted(Vc))
                             for Kc, Vc in new_caches)
            return tokens, scores, finished, gathered

        tokens, scores, _, _ = jax.lax.fori_loop(
            0, T, body, (tokens, scores, finished, caches))
        best = jnp.argmax(scores, axis=1)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]

    return jax.jit(decode) if jit else decode


def make_beam_decode_sweep(model, cfg: Config, beam_size: int = 4,
                           channel_kind: Optional[str] = None,
                           jit: bool = True) -> Callable:
    """KV-cached beam search across a VECTOR of noise levels in one jitted
    call (mirrors evaluate.greedy.make_greedy_decode_sweep):
    `sweep(params, inp, key, pnr_db, n_stds[S]) -> (S, B, T+1) ids`."""
    inner = make_beam_decode_kv(model, cfg, beam_size, channel_kind,
                                jit=False)

    def sweep(params, inp, key, pnr_db, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return jax.vmap(inner, in_axes=(None, None, 0, None, 0))(
            params, inp, keys, pnr_db, n_stds)

    return jax.jit(sweep) if jit else sweep
