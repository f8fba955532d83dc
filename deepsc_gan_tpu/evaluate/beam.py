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
from deepsc_gan_tpu.utils.config import Config

NEG = -1e9


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
            top_scores, top_idx = jax.lax.top_k(
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
