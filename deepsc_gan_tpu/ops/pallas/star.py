"""Pallas TPU kernel for the Star-Transformer satellite update.

The satellite update is the Star codec's hot op (SURVEY.md §7.8): each
position's query attends over exactly 5 context vectors
{h_{i+1}, h_i, h_{i-1}, e_i, s}. The XLA path (models/star.py) expresses
this as 5 elementwise-dot score tensors + softmax + 5 weighted combines —
~20 separate (N, H, ·) intermediates bouncing through HBM.

This kernel fuses the whole post-projection pipeline — per-head scores,
5-way softmax, weighted combine — into ONE VMEM-resident pass per row
tile. The trick that makes it lane-friendly on the VPU/MXU with
d_model=128, heads=8, depth=16:

  - keep the full d_model=128 on the LANE axis (one register row);
  - per-head dot products become (q * k_j) @ SEG, where SEG is the
    (128, 8) block-diagonal 0/1 matrix summing each head's 16 lanes —
    an MXU matmul instead of a strided reduction;
  - head weights spread back to lanes via SEG^T (8 -> 128), then a plain
    elementwise multiply-accumulate with v_j.

The neighbor rolls are done by the caller (cheap copies, XLA fuses them)
so the kernel sees a (5, N, 128) stacked context. Rows are tiled on the
grid; N is padded to the tile size by the wrapper.

Mode control: "xla" (reference implementation in models/star.py),
"pallas" (this kernel), "interpret" (this kernel in interpreter mode —
used by CPU tests), "auto" (pallas on TPU, xla elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MODE = "auto"
_VALID = ("auto", "xla", "pallas", "interpret")


def set_star_kernel_mode(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f"mode must be one of {_VALID}")
    _MODE = mode


def star_kernel_mode() -> str:
    if _MODE != "auto":
        return _MODE
    return "pallas" if jax.default_backend() == "tpu" else "xla"


_MESH_STATE = None  # Optional[(jax.sharding.Mesh, batch_axis_name)]


def set_star_kernel_mesh(mesh, axis: str = "dp") -> None:
    """Register a device mesh whose `axis` shards the batch dimension of
    every satellite-attention call traced AFTER this call (mesh=None
    clears). Same contract as ops/pallas/attention.set_attn_kernel_mesh:
    GSPMD cannot partition the Mosaic custom call, so inside mesh-parallel
    (jit + sharding-constraint) train steps the kernel is nested in a
    shard_map over `axis` — each device runs it on its local batch shard
    (rows are independent; numerics identical). Inert while the resolved
    mode is "xla"."""
    global _MESH_STATE
    _MESH_STATE = None if mesh is None else (mesh, axis)


def star_kernel_mesh():
    return _MESH_STATE


def star_satellite_attention_sharded(q, k_ctx, v_ctx, num_heads: int):
    """`star_satellite_attention`, batch-sharded over the registered mesh
    axis when one is active — the entry point models/star.py uses so the
    SAME model code traces correctly single-device and inside GSPMD dp/tp
    steps. q: (B, L, D); k_ctx/v_ctx: (5, B, L, D) — batch is dim 0 of q
    and dim 1 of the context stacks."""
    if _MESH_STATE is None or star_kernel_mode() == "xla":
        return star_satellite_attention(q, k_ctx, v_ctx, num_heads)
    mesh, axis = _MESH_STATE
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(qs, ks, vs):
        return star_satellite_attention(qs, ks, vs, num_heads)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P(None, axis), P(None, axis)),
                     out_specs=P(axis), check_vma=False)(q, k_ctx, v_ctx)


def _seg_matrix(num_heads: int, depth: int) -> np.ndarray:
    """(H*depth, H) block-diagonal ones: SEG[l, h] = 1 iff lane l belongs
    to head h."""
    d = num_heads * depth
    seg = np.zeros((d, num_heads), np.float32)
    for h in range(num_heads):
        seg[h * depth:(h + 1) * depth, h] = 1.0
    return seg


def _satellite_kernel(q_ref, k_ref, v_ref, seg_ref, out_ref, *, depth: int):
    """One row tile. q: (T, D); k/v: (5, T, D); seg: (D, H); out: (T, D)."""
    q = q_ref[:].astype(jnp.float32)
    seg = seg_ref[:]
    scale = 1.0 / jnp.sqrt(jnp.float32(depth))

    # per-head scores for the 5 contexts: (T, H) each
    scores = [
        jnp.dot(q * k_ref[j].astype(jnp.float32), seg,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) * scale
        for j in range(5)
    ]
    m = scores[0]
    for s in scores[1:]:
        m = jnp.maximum(m, s)
    exps = [jnp.exp(s - m) for s in scores]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e

    acc = jnp.zeros_like(q)
    for j in range(5):
        w = exps[j] / denom                               # (T, H)
        spread = jnp.dot(w, seg.T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # (T, D)
        acc = acc + spread * v_ref[j].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _row_tile(d: int) -> int:
    """Row-tile size: 256 at the reference d_model=128 (measured sweet
    spot, RESULTS.md) and shrinking for larger d so the ~12 f32
    tile-sized buffers (q, 5xk, 5xv, out) stay a few MB of the ~16 MB
    VMEM, leaving room for double buffering. Multiple of 8 (f32 sublane
    tiling)."""
    if d <= 128:
        return 256
    budget = 2 * 1024 * 1024  # bytes for the 12 live tile buffers
    return max(8, (budget // (12 * 4 * d)) // 8 * 8)


def _pallas_satellite(q2, k_stack, v_stack, num_heads: int,
                      interpret: bool) -> jnp.ndarray:
    n, d = q2.shape
    depth = d // num_heads
    tile = _row_tile(d)
    pad = (-n) % tile
    if pad:
        q2 = jnp.pad(q2, ((0, pad), (0, 0)))
        k_stack = jnp.pad(k_stack, ((0, 0), (0, pad), (0, 0)))
        v_stack = jnp.pad(v_stack, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad
    seg = jnp.asarray(_seg_matrix(num_heads, depth))

    out = pl.pallas_call(
        functools.partial(_satellite_kernel, depth=depth),
        out_shape=jax.ShapeDtypeStruct((np_, d), q2.dtype),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tile, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tile, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, num_heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q2, k_stack, v_stack, seg)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def star_satellite_attention(
    q: jnp.ndarray,          # (B, L, D) projected queries (flattened heads)
    k_ctx: jnp.ndarray,      # (5, B, L, D) projected keys per context slot
    v_ctx: jnp.ndarray,      # (5, B, L, D) projected values per context slot
    num_heads: int,
) -> jnp.ndarray:
    """Fused 5-context per-head attention -> (B, L, D) combined heads
    (pre-output-projection). Context slot order is irrelevant (softmax is
    permutation-invariant over keys).

    Forward runs the Pallas kernel (on TPU); the backward is the analytic
    softmax-attention VJP in XLA (recompute weights — tiny), defined via
    custom_vjp because pallas_call has no reverse-mode rule."""
    return _dispatch_fwd(q, k_ctx, v_ctx, num_heads)


def _dispatch_fwd(q, k_ctx, v_ctx, num_heads):
    b, l, d = q.shape
    mode = star_kernel_mode()
    q2 = q.reshape(b * l, d)
    k2 = k_ctx.reshape(5, b * l, d)
    v2 = v_ctx.reshape(5, b * l, d)
    if mode == "xla":
        return _xla_satellite(q2, k2, v2, num_heads).reshape(b, l, d)
    out = _pallas_satellite(q2, k2, v2, num_heads,
                            interpret=(mode == "interpret"))
    return out.reshape(b, l, d)


def _star_fwd(q, k_ctx, v_ctx, num_heads):
    return _dispatch_fwd(q, k_ctx, v_ctx, num_heads), (q, k_ctx, v_ctx)


def _star_bwd(num_heads, res, g):
    """Analytic VJP: for out = sum_j w_j v_j, w = softmax_j(q.k_j / sqrt(dh))
    per head:
        dv_j = w_j g
        a_j  = (g . v_j)  (per head)
        ds_j = w_j (a_j - sum_i w_i a_i)
        dq   = sum_j ds_j k_j / sqrt(dh);  dk_j = ds_j q / sqrt(dh)."""
    q, k_ctx, v_ctx = res
    b, l, d = q.shape
    depth = d // num_heads
    qh = q.reshape(b, l, num_heads, depth).astype(jnp.float32)
    kh = k_ctx.reshape(5, b, l, num_heads, depth).astype(jnp.float32)
    vh = v_ctx.reshape(5, b, l, num_heads, depth).astype(jnp.float32)
    gh = g.reshape(b, l, num_heads, depth).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(depth))

    scores = jnp.einsum("blhd,jblhd->jblh", qh, kh) * scale
    w = jax.nn.softmax(scores, axis=0)                        # (5,B,L,H)

    dv = jnp.einsum("jblh,blhd->jblhd", w, gh)
    a = jnp.einsum("blhd,jblhd->jblh", gh, vh)
    wa = jnp.sum(w * a, axis=0)                               # (B,L,H)
    ds = w * (a - wa[None])
    dq = jnp.einsum("jblh,jblhd->blhd", ds, kh) * scale
    dk = jnp.einsum("jblh,blhd->jblhd", ds, qh) * scale

    return (dq.reshape(b, l, d).astype(q.dtype),
            dk.reshape(5, b, l, d).astype(k_ctx.dtype),
            dv.reshape(5, b, l, d).astype(v_ctx.dtype))


star_satellite_attention.defvjp(_star_fwd, _star_bwd)


def _xla_satellite(q2, k2, v2, num_heads: int) -> jnp.ndarray:
    """Reference XLA implementation of the same math (used for equivalence
    tests and non-TPU backends)."""
    n, d = q2.shape
    depth = d // num_heads
    qh = q2.reshape(n, num_heads, depth).astype(jnp.float32)
    kh = k2.reshape(5, n, num_heads, depth).astype(jnp.float32)
    vh = v2.reshape(5, n, num_heads, depth).astype(jnp.float32)
    scores = jnp.einsum("nhd,jnhd->jnh", qh, kh) / jnp.sqrt(
        jnp.float32(depth))
    w = jax.nn.softmax(scores, axis=0)                      # (5, N, H)
    out = jnp.einsum("jnh,jnhd->nhd", w, vh)
    return out.reshape(n, d).astype(q2.dtype)
