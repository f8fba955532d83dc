"""Pallas TPU kernel for the beam-search candidate scorer: fused
vocab-projection + per-row top-K + logsumexp.

Why it exists (measured, v5e, round 3): the KV-cached beam's per-step
cost is NOT the decoder stack (30 ms of a 612 ms B=64/K=4/19-SNR sweep)
but the (B*K*S, 22234) logits stream it feeds — materializing the f32
logits (+114 ms), log-softmax over them (+102 ms), and the K
masked-argmax top-k passes (+289 ms) are all HBM-bound passes over a
~432 MB array per decode step. Beam selection only ever consumes K
values per row. This kernel computes, in one blocked pass with the
logits resident in VMEM:

    vals (N, K) f32  — top-K RAW logits per row (descending, ties to the
                       lowest vocab index, matching `lax.top_k` /
                       masked-argmax semantics)
    idx  (N, K) i32  — their vocab indices
    lse  (N, 1) f32  — logsumexp of the row (running max + online-
                       rescaled sumexp, as ops/pallas/ce.py)

so the per-step HBM traffic drops from ~4 GB to the (D, V) weight
stream. logp of a candidate is then `(val - m) - log(s)` == what
`jax.nn.log_softmax` yields at that position (identical arithmetic; the
kernel returns lse = m + log s — beam search uses `vals - lse`
uniformly on both its full-prefix and KV paths, so the two stay
token-identical).

In-kernel top-K: no argmax/sort primitives — each selection is
`max` + `min(where(x == max, cols, BIG))` (lowest index achieving the
max, i.e. first-occurrence argmax), iterated K times with the winner
masked to NEG; per vocab tile the tile's top-K is merged with the
running top-K through the same passes over the (TN, 2K) concat, with
the running list placed FIRST so earlier (lower-index) candidates win
ties.

Mode control mirrors ops/pallas/ce.py: "auto" = kernel on TPU, plain
XLA elsewhere; "interpret" runs the kernel in interpreter mode for CPU
tests; "xla" forces the fallback.

The reference has no beam search (greedy only, utlis/eval.py); this
kernel serves the framework's serving-quality extension
(evaluate/beam.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepsc_gan_tpu.ops.fused_ce import _op_dtype
from deepsc_gan_tpu.ops.pallas.ce import _pad_rows, _pad_vocab

NEG = -1e30
IBIG = 2 ** 30

_MODE = "auto"
_VALID = ("auto", "xla", "pallas", "interpret")


def set_topk_kernel_mode(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f"mode must be one of {_VALID}")
    _MODE = mode


def topk_kernel_mode() -> str:
    if _MODE != "auto":
        return _MODE
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _take_top(x, cols, k, first_max=None):
    """k (max, lowest-index-of-max) passes over the last axis; masks each
    winner to NEG. Returns (vals (N..., k), idx (N..., k)); x consumed.
    `first_max` skips round 1's max-reduce when the caller already has
    it (the kernel shares it with the online-softmax update)."""
    vals, idxs = [], []
    for r in range(k):
        mx = first_max if (r == 0 and first_max is not None) else \
            jnp.max(x, axis=-1, keepdims=True)
        ix = jnp.min(jnp.where(x == mx, cols, IBIG), axis=-1,
                     keepdims=True)
        vals.append(mx)
        idxs.append(ix)
        x = jnp.where(cols == ix, NEG, x)
    return (jnp.concatenate(vals, axis=-1),
            jnp.concatenate(idxs, axis=-1).astype(jnp.int32))


def _topk_kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
                 m_sc, s_sc, tv_sc, ti_sc, *, tv: int, k: int,
                 n_vt: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        s_sc[:] = jnp.zeros_like(s_sc)
        tv_sc[:] = jnp.full_like(tv_sc, NEG)
        ti_sc[:] = jnp.zeros_like(ti_sc)

    logits = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)                      # (TN, TV)
    tn = logits.shape[0]

    # online logsumexp accumulators (as ops/pallas/ce.py forward)
    m_old = m_sc[:]
    cm = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, cm)
    s_sc[:] = s_sc[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_sc[:] = m_new

    # tile top-k (global vocab indices; round 1 reuses cm), then merge
    # with the running top-k; running list first so lower-index
    # candidates win ties
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * tv
    t_vals, t_idx = _take_top(logits, cols, k, first_max=cm)
    all_v = jnp.concatenate([tv_sc[:], t_vals], axis=1)     # (TN, 2K)
    all_i = jnp.concatenate([ti_sc[:], t_idx], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tn, 2 * k), 1)
    best_v, best_p = _take_top(all_v, pos, k)
    # gather the merged indices by selected position (min-over-matching)
    merged_i = jnp.concatenate(
        [jnp.min(jnp.where(pos == best_p[:, i:i + 1], all_i, IBIG),
                 axis=1, keepdims=True) for i in range(k)], axis=1)
    tv_sc[:] = best_v
    ti_sc[:] = merged_i.astype(jnp.int32)

    @pl.when(j == n_vt - 1)
    def _():
        vals_ref[:] = tv_sc[:]
        idx_ref[:] = ti_sc[:]
        lse_ref[:] = m_sc[:] + jnp.log(s_sc[:])


def _pallas_topk_logits(h, W, b, k, tn, tv, interpret):
    n, d = h.shape
    Wp, bp = _pad_vocab(W, b, tv)
    hp = _pad_rows(h, tn)
    np_, vp = hp.shape[0], Wp.shape[1]
    n_vt = vp // tv

    vals, idx, lse = pl.pallas_call(
        functools.partial(_topk_kernel, tv=tv, k=k, n_vt=n_vt),
        out_shape=(jax.ShapeDtypeStruct((np_, k), jnp.float32),
                   jax.ShapeDtypeStruct((np_, k), jnp.int32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32)),
        grid=(np_ // tn, n_vt),
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((tn, k), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tn, k), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, k), jnp.float32),
                        pltpu.VMEM((tn, k), jnp.int32)],
        interpret=interpret,
    )(hp, Wp, bp[None, :])
    return vals[:n], idx[:n], lse[:n, 0]


def _xla_topk_logits(h, W, b, k):
    """Reference implementation (and CPU path): same outputs from the
    materialized logits. Matmul operand/accumulation policy matches the
    kernel (operands in h's dtype, f32 accumulate/bias)."""
    logits = jnp.dot(h, W, preferred_element_type=jnp.float32) \
        + b.astype(jnp.float32)                              # (N, V)
    m = jnp.max(logits, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    vals, idx = _take_top(logits, cols, k)
    return vals, idx, (m + jnp.log(s))[:, 0]


def topk_logits(h, W, b, k: int = 4, tn: int = 256, tv: int = 2048):
    """Top-k raw logits + indices + logsumexp of `h @ W + b` per row,
    without materializing the (N, V) logits in HBM (on TPU).
    h: (N, D); W: (D, V); b: (V,) ->
    (vals (N, k) f32, idx (N, k) i32, lse (N,) f32).
    `vals - lse[:, None]` is the log-softmax at those positions."""
    mode = topk_kernel_mode()
    od = _op_dtype(h)
    if mode == "xla":
        return _xla_topk_logits(h.astype(od), W.astype(od), b, k)
    return _pallas_topk_logits(h.astype(od), W.astype(od),
                               b.astype(jnp.float32), k, tn, tv,
                               mode == "interpret")
