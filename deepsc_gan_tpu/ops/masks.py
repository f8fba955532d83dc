"""Attention mask builders.

Same conventions as the reference (`DeepSC-GAN/models/modules.py:757-777`):
masks are float arrays with 1.0 at positions to BLOCK, applied additively as
`logits += mask * -1e9`. Padding mask has shape (B, 1, 1, L) so it
broadcasts over (B, heads, Lq, Lk); the look-ahead mask is (L, L); the
combined decoder mask is max(pad, causal).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9


def create_padding_mask(seq: jnp.ndarray, pad_idx: int = 0) -> jnp.ndarray:
    """(B, L) int tokens -> (B, 1, 1, L) float mask, 1.0 where PAD."""
    mask = (seq == pad_idx).astype(jnp.float32)
    return mask[:, None, None, :]


def create_look_ahead_mask(size: int) -> jnp.ndarray:
    """(L, L) float mask, 1.0 strictly above the diagonal."""
    return 1.0 - jnp.tril(jnp.ones((size, size), dtype=jnp.float32))


def create_masks(inp: jnp.ndarray, tar: jnp.ndarray, pad_idx: int = 0):
    """-> (enc_padding_mask, combined_mask, dec_padding_mask), the triple
    every train/eval step builds (reference `create_masks`)."""
    enc_padding_mask = create_padding_mask(inp, pad_idx)
    dec_padding_mask = create_padding_mask(inp, pad_idx)
    look_ahead = create_look_ahead_mask(tar.shape[1])
    dec_target_padding_mask = create_padding_mask(tar, pad_idx)
    combined_mask = jnp.maximum(dec_target_padding_mask, look_ahead)
    return enc_padding_mask, combined_mask, dec_padding_mask
