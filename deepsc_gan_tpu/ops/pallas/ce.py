"""Pallas TPU kernels for the fused vocab-projection + cross-entropy.

The (B*L, 22234) logits are this model's HBM bottleneck (see
ops/fused_ce.py). The lax.scan implementation there already avoids
materializing them, but it still runs ~25 small kernels per step with
while-loop overhead, and its (N, chunk) chunk logits spill to HBM once N
grows past VMEM. These kernels do the whole thing as a blocked grid:

  forward  : grid (nN, nV), V innermost. Per (i, j): one (TN, D)x(D, TV)
             MXU matmul, online-softmax accumulators (running max /
             rescaled sumexp) in VMEM scratch, gold logit picked up by an
             iota==label compare when the owning vocab tile passes by.
             Chunk logits NEVER leave VMEM.
  backward : two kernels recomputing chunk logits —
             dh   : grid (nN, nV), accumulates (softmax - onehot) @ W^T
                    into the (TN, D) output block held in VMEM across the
                    inner V sweep;
             dW/db: grid (nV, nN), N innermost, accumulates h^T @ p into
                    the (D, TV) output block held in VMEM across the inner
                    N sweep.

Numerics: f32 accumulation and softmax arithmetic throughout. Matmul
OPERANDS keep the activation dtype: with bf16 hidden states the chunk
matmuls run bf16 x bf16 -> f32 at full MXU rate (the standard
mixed-precision contract; f32 operands behave exactly as before). Tiles
default (512, 2048): VMEM high-water ~7 MB per program (~16 MB/core
available) — the 512-row tile halves how many times the (D, V) table
re-streams from HBM vs 256 (W traffic = V*D*2B per row tile).

Production note (measured v5e, round 3): the FORWARD kernel is the fast
half; the two-kernel backward pays a second logits recompute that the
lax.scan backward (one pass producing dh AND dW/db) avoids. The shipped
fast path is therefore `ops.fused_ce.hybrid_softmax_xent` — this
forward + the scan backward — which beats both all-Pallas and all-scan
at every benched width (numbers in its docstring). The backward kernels
here remain correct, interpret-tested, and selectable via
`set_ce_kernel_mode`.

Mode control mirrors ops/pallas/star.py: "auto" picks the kernels on TPU
and the lax.scan path elsewhere; "interpret" runs these kernels in
interpreter mode for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepsc_gan_tpu.ops.fused_ce import _op_dtype

NEG = -1e30

_MODE = "auto"
_VALID = ("auto", "scan", "pallas", "interpret")


def set_ce_kernel_mode(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f"mode must be one of {_VALID}")
    _MODE = mode


def ce_kernel_mode() -> str:
    if _MODE != "auto":
        return _MODE
    return "pallas" if jax.default_backend() == "tpu" else "scan"


def _pad_rows(x, tile, value=0):
    pad = (-x.shape[0]) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=value)
    return x


def _pad_vocab(W, b, tile):
    d, v = W.shape
    pad = (-v) % tile
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        b = jnp.pad(b, (0, pad), constant_values=NEG)
    return W, b


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(h_ref, w_ref, b_ref, lab_ref, ce_ref, lse_ref,
                m_sc, s_sc, g_sc, *, tv: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        s_sc[:] = jnp.zeros_like(s_sc)
        g_sc[:] = jnp.zeros_like(g_sc)

    logits = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)                       # (TN, TV)

    m_old = m_sc[:]                                          # (TN, 1)
    cm = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, cm)
    s_sc[:] = s_sc[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_sc[:] = m_new

    # gold logit: one-hot via global column iota == label
    tn = logits.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * tv
    onehot = (cols == lab_ref[:]).astype(jnp.float32)
    g_sc[:] = g_sc[:] + jnp.sum(logits * onehot, axis=1, keepdims=True)

    lse = m_sc[:] + jnp.log(s_sc[:])
    lse_ref[:] = lse
    ce_ref[:] = lse - g_sc[:]


def _pallas_ce_fwd(h, W, b, labels, tn, tv, interpret):
    n = h.shape[0]
    d = h.shape[1]
    Wp, bp = _pad_vocab(W, b, tv)
    hp = _pad_rows(h, tn)
    lp = _pad_rows(labels[:, None], tn)
    np_, vp = hp.shape[0], Wp.shape[1]

    ce, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, tv=tv),
        out_shape=(jax.ShapeDtypeStruct((np_, 1), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32)),
        grid=(np_ // tn, vp // tv),
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32)],
        interpret=interpret,
    )(hp, Wp, bp[None, :], lp)
    return ce[:n, 0], lse[:n, 0]


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _dh_kernel(h_ref, w_ref, b_ref, lab_ref, lse_ref, g_ref, dh_ref,
               *, tv: int):
    j = pl.program_id(1)
    w = w_ref[:]
    logits = jnp.dot(h_ref[:], w, preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)
    p = jnp.exp(logits - lse_ref[:]) * g_ref[:]              # (TN, TV)
    tn = p.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * tv
    onehot = (cols == lab_ref[:]).astype(jnp.float32)
    p = p - onehot * g_ref[:]
    contrib = jnp.dot(p.astype(w.dtype), w.T,
                      preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dh_ref[:] = contrib

    @pl.when(j != 0)
    def _():
        dh_ref[:] = dh_ref[:] + contrib


def _dw_kernel(h_ref, w_ref, b_ref, lab_ref, lse_ref, g_ref,
               dw_ref, db_ref, *, tv: int):
    j = pl.program_id(0)
    i = pl.program_id(1)
    h = h_ref[:]
    logits = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)
    p = jnp.exp(logits - lse_ref[:]) * g_ref[:]
    tn = p.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * tv
    onehot = (cols == lab_ref[:]).astype(jnp.float32)
    p = p - onehot * g_ref[:]
    dw_c = jnp.dot(h.T, p.astype(h.dtype),
                   preferred_element_type=jnp.float32)          # (D, TV)
    db_c = jnp.sum(p, axis=0, keepdims=True)                    # (1, TV)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw_c
        db_ref[:] = db_c

    @pl.when(i != 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_c
        db_ref[:] = db_ref[:] + db_c


def _pallas_ce_bwd(h, W, b, labels, lse, g, tn, tv, interpret):
    n, d = h.shape
    v = W.shape[1]
    Wp, bp = _pad_vocab(W, b, tv)
    hp = _pad_rows(h, tn)
    lp = _pad_rows(labels[:, None], tn)
    lsep = _pad_rows(lse[:, None], tn)
    gp = _pad_rows(g[:, None], tn)        # zero cotangent on padded rows
    np_, vp = hp.shape[0], Wp.shape[1]

    common_specs = [
        pl.BlockSpec((tn, d), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tv), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tv), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
    ]

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, tv=tv),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        grid=(np_ // tn, vp // tv),
        in_specs=common_specs,
        out_specs=pl.BlockSpec((tn, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hp, Wp, bp[None, :], lp, lsep, gp)

    # dW/db: N innermost so the (D, TV) output block accumulates in VMEM
    dw_specs = [
        pl.BlockSpec((tn, d), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tv), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tv), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dW, db = pl.pallas_call(
        functools.partial(_dw_kernel, tv=tv),
        out_shape=(jax.ShapeDtypeStruct((d, vp), jnp.float32),
                   jax.ShapeDtypeStruct((1, vp), jnp.float32)),
        grid=(vp // tv, np_ // tn),
        in_specs=dw_specs,
        out_specs=(pl.BlockSpec((d, tv), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tv), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(hp, Wp, bp[None, :], lp, lsep, gp)

    return dh[:n], dW[:, :v], db[0, :v]


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_softmax_xent(h, W, b, labels, tn: int = 0, tv: int = 0):
    """Per-row CE via the Pallas kernels. h: (N, D); W: (D, V); b: (V,);
    labels: (N,) -> (N,) f32. tn=0 picks the row tile from D so the dW
    kernel's live blocks (dw f32 (D,TV) + logits f32 (TN,TV) + operands)
    stay under the ~16 MB scoped-VMEM limit: 512 rows at D<=256, 256
    beyond (bigger row tiles halve how often the vocab table re-streams
    from HBM)."""
    ce, _ = _fwd_dispatch(h, W, b, labels, tn, tv)
    return ce


def _pick_tn(tn: int, d: int) -> int:
    return tn if tn else (512 if d <= 256 else 256)


def _pick_tv(tv: int, d: int) -> int:
    # the dW kernel holds dw f32 (D, TV) + logits f32 (TN, TV) + double-
    # buffered operands in scoped VMEM; shrink the vocab tile at large D
    return tv if tv else (2048 if d <= 256 else 1024)


def _fwd_dispatch(h, W, b, labels, tn, tv):
    interp = ce_kernel_mode() == "interpret"
    tn = _pick_tn(tn, h.shape[1])
    tv = _pick_tv(tv, h.shape[1])
    od = _op_dtype(h)
    return _pallas_ce_fwd(h.astype(od), W.astype(od),
                          b.astype(jnp.float32),
                          labels.astype(jnp.int32), tn, tv, interp)


def _op_fwd(h, W, b, labels, tn, tv):
    ce, lse = _fwd_dispatch(h, W, b, labels, tn, tv)
    return ce, (h, W, b, labels, lse)


def _op_bwd(tn, tv, res, g):
    h, W, b, labels, lse = res
    interp = ce_kernel_mode() == "interpret"
    tn = _pick_tn(tn, h.shape[1])
    tv = _pick_tv(tv, h.shape[1])
    od = _op_dtype(h)
    dh, dW, db = _pallas_ce_bwd(
        h.astype(od), W.astype(od),
        b.astype(jnp.float32), labels.astype(jnp.int32), lse,
        g.astype(jnp.float32), tn, tv, interp)
    return dh.astype(h.dtype), dW.astype(W.dtype), db.astype(b.dtype), None


pallas_softmax_xent.defvjp(_op_fwd, _op_bwd)
