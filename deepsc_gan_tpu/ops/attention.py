"""Multi-head attention, TPU-first.

Behavioral spec from the reference `sublayer1`
(`DeepSC-GAN/models/modules.py:26-123`): bias-free Q/K/V projections,
scaled dot-product (scale = sqrt(per-head depth), modules.py:59 computes it
on the head-split tensor), additive -1e9 masking, biased output projection.

TPU design notes:
- head split/merge is expressed as einsum contractions over a (B,L,H,Dh)
  layout (single MXU-friendly batched matmuls, no transpose pairs for XLA
  to clean up);
- attention logits and softmax run in float32 even when activations are
  bfloat16, so the -1e9 mask bias doesn't saturate bf16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        assert self.d_model % self.num_heads == 0
        depth = self.d_model // self.num_heads

        def proj(name):
            return nn.DenseGeneral(
                features=(self.num_heads, depth),
                axis=-1,
                use_bias=False,  # reference Q/K/V denses are bias-free
                name=name,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )

        qh = proj("wq")(q)  # (B, Lq, H, Dh)
        kh = proj("wk")(k)  # (B, Lk, H, Dh)
        vh = proj("wv")(v)  # (B, Lk, H, Dh)

        scale = jnp.sqrt(jnp.asarray(depth, jnp.float32))
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) / scale
        if mask is not None:
            # mask broadcasts: (B,1,1,Lk) padding or (Lq,Lk) causal or
            # (B,1,Lq,Lk) combined; 1.0 = blocked
            logits = logits + mask.astype(jnp.float32) * -1e9
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)

        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        return nn.DenseGeneral(
            features=self.d_model,
            axis=(-2, -1),
            use_bias=True,
            name="out",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(out)
