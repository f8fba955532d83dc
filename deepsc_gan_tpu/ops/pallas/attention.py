"""Fused scaled-dot-product attention kernel (Pallas, TPU).

Why this exists: at the reference's small-head shapes (L=31/32,
Dh=16-32, H=8 — `DeepSC-GAN/models/modules.py:26-123`), XLA's batched
attention einsums force the projected (B, L, H, Dh) tensors through
several competing HBM layouts — the d256 profile's 12.5 ms/step `copy`
family (results/profile_d256_r5.json), which survived the seq-pad,
packed-QKV, and head-layout A/Bs because every XLA formulation still
materializes 4-D head tensors whose 32-wide minor dim wastes 3/4 of a
(8, 128) tile. This kernel removes the tensors instead of re-laying
them:

- I/O stays 3-D and lane-aligned: q/k/v arrive as (B, L, H*Dh) — the
  raw projection output, H*Dh = d_model = a multiple of 128 at the
  shapes that matter — and the context leaves the same way. No 4-D
  activation ever exists in HBM.
- Heads are split INSIDE the kernel by static lane slices; per head a
  batched `dot_general` (batch = the Bt-row block) runs
  scores -> softmax -> context entirely in VMEM, f32 logits like the
  XLA path (ops/attention.py).
- The mask is pre-collapsed to ONE additive f32 bias (B, Lq, Lk) —
  broadcast over heads in VMEM, never materialized per head.
- Backward is a custom VJP that recomputes the softmax in-kernel
  (flash-attention-style rematerialization) and emits dq/dk/dv in the
  same 3-D layout, plus the exact dbias (summed over heads).

Modes (module switch, same pattern as ops/pallas/ce.py): "xla" is the
default einsum path in ops/attention.py — this module is only entered
when `set_attn_kernel_mode` selects "pallas" (TPU) or "interpret"
(this kernel under the Pallas interpreter, for CPU tests). Measured
adopt-or-reject through `bench.py --attn-kernel-ab` (RESULTS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VALID = ("auto", "xla", "pallas", "interpret")
_MODE = "auto"


def set_attn_kernel_mode(mode: str) -> None:
    """Select the attention implementation traced by MultiHeadAttention
    (takes effect on functions traced AFTER the call). "auto" resolves
    to this kernel on TPU and the XLA einsum path elsewhere (same
    policy as ops/pallas/star.py). Adopted as the TPU default after the
    A/B: 1.77x at d256, 1.10x at flagship (RESULTS.md, bench.py
    --attn-kernel-ab)."""
    assert mode in _VALID, mode
    global _MODE
    _MODE = mode


def attn_kernel_mode() -> str:
    """The RESOLVED mode ("xla" | "pallas" | "interpret")."""
    if _MODE != "auto":
        return _MODE
    return "pallas" if jax.default_backend() == "tpu" else "xla"


_MESH_STATE = None  # Optional[(jax.sharding.Mesh, batch_axis_name)]


def set_attn_kernel_mesh(mesh, axis: str = "dp") -> None:
    """Register a device mesh whose `axis` shards the batch dimension of
    every attention call traced AFTER this call (pass mesh=None to
    clear). GSPMD cannot partition the Mosaic custom call this kernel
    emits, so inside mesh-parallel (jit + sharding-constraint) train
    steps `fused_attention` is wrapped in a nested `shard_map` over
    `axis`: each device runs the kernel on its local batch shard — the
    layout the dp steps already give the activations, so no collectives
    or resharding are introduced (rows are independent; numerics are
    identical to the unsharded kernel). Inert while the resolved mode is
    "xla" (ops/attention.py never reaches this module then)."""
    global _MESH_STATE
    _MESH_STATE = None if mesh is None else (mesh, axis)


def attn_kernel_mesh():
    return _MESH_STATE


def fused_attention_sharded(q, k, v, bias, heads: int, scale: float):
    """`fused_attention`, batch-sharded over the registered mesh axis
    (set_attn_kernel_mesh) when one is active — the entry point
    ops/attention.py uses so the SAME model code traces correctly both
    single-device and inside GSPMD dp steps."""
    if _MESH_STATE is None:
        return fused_attention(q, k, v, bias, heads, scale)
    mesh, axis = _MESH_STATE
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(axis)

    def local(qs, ks, vs, bs):
        return fused_attention(qs, ks, vs, bs, heads, scale)

    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v, bias)


def _pick_bt(b: int, lq: int, lk: int, hd: int) -> int:
    """Largest row-block that keeps the five (Bt, L, H*Dh) operands plus
    per-head f32 score tiles comfortably under the ~16 MB VMEM budget."""
    for bt in (64, 32, 16, 8, 4, 2, 1):
        if b % bt:
            continue
        operands = 4 * bt * max(lq, lk) * hd * 4  # q,k,v,ctx upper bound
        scores = 3 * bt * lq * lk * 4
        if operands + scores <= 6 * 1024 * 1024:
            return bt
    return 1


def _head_slices(ref, h: int, dh: int):
    return ref[:, :, h * dh:(h + 1) * dh]


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, heads: int,
                scale: float):
    hd = q_ref.shape[-1]
    dh = hd // heads
    bias = b_ref[:]  # (Bt, Lq, Lk) f32, broadcast over heads
    batch_dn = lambda c: (((c,), (c,)), ((0,), (0,)))  # noqa: E731
    for h in range(heads):
        q = _head_slices(q_ref, h, dh)
        k = _head_slices(k_ref, h, dh)
        v = _head_slices(v_ref, h, dh)
        s = jax.lax.dot_general(q, k, batch_dn(2),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / scale) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = ctx.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, b_ref, g_ref,
                dq_ref, dk_ref, dv_ref, db_ref, *, heads: int,
                scale: float):
    """Recompute softmax per head, then the standard attention VJP:
    dv = p^T g, dp = g v^T, ds = p*(dp - rowsum(dp*p)), dq = ds k /scale,
    dk = ds^T q /scale, dbias = sum_h ds."""
    hd = q_ref.shape[-1]
    dh = hd // heads
    bias = b_ref[:]
    db = jnp.zeros(bias.shape, jnp.float32)
    for h in range(heads):
        q = _head_slices(q_ref, h, dh)
        k = _head_slices(k_ref, h, dh)
        v = _head_slices(v_ref, h, dh)
        g = _head_slices(g_ref, h, dh)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / scale) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (Bt, Lq, Lk) f32
        pc = p.astype(v.dtype)
        # dv: contract Lq.  dp: contract Dh.
        dv = jax.lax.dot_general(pc, g, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        db = db + ds
        dss = (ds * (1.0 / scale)).astype(q.dtype)
        dq = jax.lax.dot_general(dss, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dss, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, h * dh:(h + 1) * dh] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, h * dh:(h + 1) * dh] = dv.astype(dv_ref.dtype)
    db_ref[:] = db


def _specs(bt, lq, lk, hd):
    row = lambda i: (i, 0, 0)  # noqa: E731
    qs = pl.BlockSpec((bt, lq, hd), row, memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((bt, lk, hd), row, memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((bt, lq, lk), row, memory_space=pltpu.VMEM)
    return qs, ks, bs


def _fwd_call(q, k, v, bias, heads, scale, interpret):
    b, lq, hd = q.shape
    lk = k.shape[1]
    bt = _pick_bt(b, lq, lk, hd)
    qs, ks, bs = _specs(bt, lq, lk, hd)
    kern = functools.partial(_fwd_kernel, heads=heads, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[qs, ks, ks, bs],
        out_specs=qs,
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _bwd_call(q, k, v, bias, g, heads, scale, interpret):
    b, lq, hd = q.shape
    lk = k.shape[1]
    bt = _pick_bt(b, lq, lk, hd)
    qs, ks, bs = _specs(bt, lq, lk, hd)
    kern = functools.partial(_bwd_kernel, heads=heads, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[qs, ks, ks, bs, qs],
        out_specs=(qs, ks, ks, bs),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        interpret=interpret,
    )(q, k, v, bias, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, bias, heads: int, scale: float):
    """softmax(q k^T / scale + bias) v, per head, fused in VMEM.

    q: (B, Lq, H*Dh); k, v: (B, Lk, H*Dh); bias: (B, Lq, Lk) additive
    f32 (the -1e9-premultiplied mask, broadcast over heads). Returns
    the per-head contexts re-packed as (B, Lq, H*Dh) in q.dtype.
    Numerics match ops/attention.py's einsum path: f32 logits/softmax,
    probabilities cast to the activation dtype for the context matmul
    (pinned by tests/test_ops.py::test_fused_attention_*)."""
    interpret = _MODE == "interpret"
    return _fwd_call(q, k, v, bias, heads, scale, interpret)


def _fa_fwd(q, k, v, bias, heads, scale):
    interpret = _MODE == "interpret"
    out = _fwd_call(q, k, v, bias, heads, scale, interpret)
    return out, (q, k, v, bias)


def _fa_bwd(heads, scale, res, g):
    q, k, v, bias = res
    interpret = _MODE == "interpret"
    dq, dk, dv, db = _bwd_call(q, k, v, bias, g.astype(q.dtype), heads,
                               scale, interpret)
    return dq, dk, dv, db


fused_attention.defvjp(_fa_fwd, _fa_bwd)
