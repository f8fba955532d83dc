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
  bfloat16, so the -1e9 mask bias doesn't saturate bf16;
- optional QKV packing (`set_qkv_fusion`): the three (D, H*Dh) projection
  matmuls are traced as ONE (D, 3*H*Dh) matmul when q/k/v share an input
  (self-attention; k/v pack pairwise for cross-attention). The kernels are
  stacked at trace time so the PARAM TREE IS UNCHANGED — same `wq/wk/wv`
  names, shapes, and init as the unfused path; checkpoints, the KV-cache
  decoder's direct kernel reads (evaluate/kv_decode.py), and the TF
  shape-map parity all hold under either setting. Flip BEFORE building a
  jitted step (the flag is read at trace time).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_QKV_FUSION = False


def set_qkv_fusion(on: bool) -> None:
    """Globally enable/disable packed-QKV tracing. Takes effect on
    functions traced AFTER the call (jit caches keep their trace)."""
    global _QKV_FUSION
    _QKV_FUSION = bool(on)


def qkv_fusion() -> bool:
    return _QKV_FUSION


def _dg_kernel_init(rng, shape, dtype):
    """flax DenseGeneral's default init for an (in, *features) kernel:
    lecun_normal drawn on the flattened 2-D (in, prod(features)) shape,
    reshaped — reproduced here so the manual param declaration below is
    distribution-identical to the DenseGeneral it replaced."""
    flat = (shape[0], int(np.prod(shape[1:])))
    return nn.initializers.lecun_normal()(rng, flat, dtype).reshape(shape)


class ProjKernel(nn.Module):
    """A bare (D, H, Dh) projection kernel declared under the SAME param
    path (`<name>/kernel`) a bias-free DenseGeneral would use, but exposed
    as a raw array so the caller can stack several kernels into one packed
    MXU matmul."""

    shape: Tuple[int, ...]
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", _dg_kernel_init, self.shape,
                          self.param_dtype)


def project(x: jnp.ndarray, kernel: jnp.ndarray,
            dtype: jnp.dtype) -> jnp.ndarray:
    """(..., D) x (D, H, Dh) -> (..., H, Dh) — one head-split projection."""
    return jnp.einsum("...d,dhk->...hk", x.astype(dtype),
                      kernel.astype(dtype))


def project_packed(x: jnp.ndarray, kernels, dtype: jnp.dtype):
    """Apply N projections that share the input as ONE packed matmul:
    (..., D) x (D, N, H, Dh) -> N tensors (..., H, Dh). The stack is a
    trace-time reshuffle of the (unchanged) per-projection params; XLA
    folds it into a single (D, N*H*Dh) MXU contraction instead of N
    separate kernels with their own layout copies."""
    packed = jnp.stack([k.astype(dtype) for k in kernels], axis=1)
    out = jnp.einsum("...d,dnhk->n...hk", x.astype(dtype), packed)
    return tuple(out[i] for i in range(len(kernels)))


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

        def kernel(name, x):
            # reference Q/K/V denses are bias-free
            return ProjKernel((x.shape[-1], self.num_heads, depth),
                              self.param_dtype, name=name)()

        wq, wk, wv = kernel("wq", q), kernel("wk", k), kernel("wv", v)
        if _QKV_FUSION and q is k and k is v:
            # self-attention: one (D, 3*H*Dh) matmul
            qh, kh, vh = project_packed(q, (wq, wk, wv), self.dtype)
        elif _QKV_FUSION and k is v:
            # cross-attention: K/V share the memory input
            qh = project(q, wq, self.dtype)
            kh, vh = project_packed(k, (wk, wv), self.dtype)
        else:
            qh = project(q, wq, self.dtype)  # (B, Lq, H, Dh)
            kh = project(k, wk, self.dtype)  # (B, Lk, H, Dh)
            vh = project(v, wv, self.dtype)  # (B, Lk, H, Dh)

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
