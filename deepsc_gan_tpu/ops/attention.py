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
_HEAD_LAYOUT = "blhd"


def set_qkv_fusion(on: bool) -> None:
    """Globally enable/disable packed-QKV tracing. Takes effect on
    functions traced AFTER the call (jit caches keep their trace)."""
    global _QKV_FUSION
    _QKV_FUSION = bool(on)


def qkv_fusion() -> bool:
    return _QKV_FUSION


def set_head_layout(layout: str) -> None:
    """Pick the attention activation layout traced by MultiHeadAttention
    (takes effect on functions traced AFTER the call):

    - "blhd" (default): project to (B, L, H, Dh); the logits einsum
      transposes to (B, H, Lq, Lk) and the context einsum transposes
      back. XLA materializes those layout changes as inter-fusion copies
      — the d256 profile's 12.5 ms/step `copy` family
      (results/profile_d256_r5.json).
    - "bhld": project straight to (B, H, L, Dh) so the whole
      logits -> softmax -> context chain is layout-consistent (einsums
      'bhqd,bhkd->bhqk' and 'bhqk,bhkd->bhqd' need no transposes); the
      output projection contracts (H, Dh) as axes (-3, -1). The PARAM
      TREE IS UNCHANGED (same kernel shapes (D, H, Dh) / (H, Dh, D)),
      so checkpoints are interchangeable; equivalence pinned in
      tests/test_models.py. A/B-measured via bench.py --attn-ab.
    """
    global _HEAD_LAYOUT
    assert layout in ("blhd", "bhld"), layout
    _HEAD_LAYOUT = layout


def head_layout() -> str:
    return _HEAD_LAYOUT


def _attn_kernel_on() -> bool:
    """True when the fused Pallas attention (ops/pallas/attention.py) is
    selected via its own mode switch ("pallas" on TPU, "interpret" for
    CPU tests; default "xla" = the einsum paths below)."""
    from deepsc_gan_tpu.ops.pallas.attention import attn_kernel_mode
    return attn_kernel_mode() != "xla"


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
        if _attn_kernel_on() and q.ndim == 3:
            # fused Pallas path (ops/pallas/attention.py): projections
            # stay 3-D and lane-aligned (the '...hk' einsum + merge-minor
            # reshape folds into ONE (D, H*Dh) matmul); scores/softmax/
            # context never leave VMEM, so no (B, H or L, ...) 4-D head
            # tensor is ever materialized in HBM
            # fused_attention_sharded: identical to fused_attention on
            # one device; inside a GSPMD dp step it nests a shard_map
            # over the registered batch axis (set_attn_kernel_mesh) so
            # the Mosaic custom call partitions cleanly
            from deepsc_gan_tpu.ops.pallas.attention import (
                fused_attention_sharded as fused_attention,
            )
            dt = self.dtype
            b, lq = q.shape[0], q.shape[1]
            lk = k.shape[1]
            hd = self.num_heads * depth

            def proj3(x, w):
                return jnp.einsum("bld,dx->blx", x.astype(dt),
                                  w.reshape(w.shape[0], hd).astype(dt))

            qp, kp, vp = proj3(q, wq), proj3(k, wk), proj3(v, wv)
            if mask is None:
                bias = jnp.zeros((b, lq, lk), jnp.float32)
            else:
                mb = mask.astype(jnp.float32) * -1e9
                if mb.ndim == 4:  # (B,1,1,Lk) pad or (B,1,Lq,Lk) combined
                    bias = jnp.broadcast_to(mb, (b, 1, lq, lk)).reshape(
                        b, lq, lk)
                else:  # (Lq, Lk) causal
                    bias = jnp.broadcast_to(mb, (b, lq, lk))
            ctx = fused_attention(qp, kp, vp, bias, self.num_heads,
                                  float(np.sqrt(depth)))
            # reshape + immediate (-2,-1) contraction folds into a plain
            # (H*Dh, D) matmul; param tree identical to the einsum path
            return nn.DenseGeneral(
                features=self.d_model, axis=(-2, -1), use_bias=True,
                name="out", dtype=dt, param_dtype=self.param_dtype)(
                    ctx.reshape(b, lq, self.num_heads, depth))
        if _HEAD_LAYOUT == "bhld" and q.ndim == 3:
            # layout-consistent chain: project straight into (B, H, L, Dh)
            # so neither einsum below needs a transposed operand layout
            dt = self.dtype
            qh = jnp.einsum("bqd,dhk->bhqk", q.astype(dt), wq.astype(dt))
            kh = jnp.einsum("bmd,dhk->bhmk", k.astype(dt), wk.astype(dt))
            vh = jnp.einsum("bmd,dhk->bhmk", v.astype(dt), wv.astype(dt))
            scale = jnp.sqrt(jnp.asarray(depth, jnp.float32))
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh,
                                kh).astype(jnp.float32) / scale
            if mask is not None:
                logits = logits + mask.astype(jnp.float32) * -1e9
            weights = jax.nn.softmax(logits, axis=-1).astype(dt)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
            # contracting (H, Dh) at axes (-3, -1) keeps the SAME kernel
            # shape (H, Dh, d_model) as the (-2, -1) call on (B,L,H,Dh)
            return nn.DenseGeneral(
                features=self.d_model, axis=(-3, -1), use_bias=True,
                name="out", dtype=dt,
                param_dtype=self.param_dtype)(ctx)
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
