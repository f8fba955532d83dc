"""Fused vocab-projection + cross-entropy (chunked, custom VJP).

Why: the (B, L, 22234) float32 logits tensor dominates this model's HBM
traffic. The naive path (Dense -> logsumexp -> gather, standard autodiff)
materializes logits-sized tensors ~9 times per train step (measured via
XLA cost analysis: ~5.5 GB accessed/step at B=64 — the step is
bandwidth-bound, not FLOP-bound). This op computes

    ce_i = logsumexp_v(h_i . W_v + b_v) - (h_i . W_{y_i} + b_{y_i})

by streaming over vocab chunks with a running (max, sumexp) accumulator —
an online-softmax over the vocab axis — and a custom VJP that RECOMPUTES
chunk logits in the backward instead of saving them. Per-chunk logits
live only inside a `lax.scan` iteration, sized to stay in VMEM, so total
HBM traffic drops to ~2 logits-passes (one fwd, one bwd recompute).

Numerics: all softmax arithmetic in float32. Matmul OPERANDS follow the
activation dtype (bf16 hidden -> bf16 x bf16 -> f32-accumulate chunk
matmuls at full MXU rate — the standard mixed-precision contract); with
f32 operands results match the naive ops.losses path to ~1e-5 (tested).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

NEG = -1e30


def _pad_vocab(W, b, chunk: int):
    d, v = W.shape
    pad = (-v) % chunk
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        b = jnp.pad(b, (0, pad), constant_values=NEG)
    return W, b, v + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_softmax_xent(h, W, b, labels, chunk: int = 2048):
    """Per-row CE from hidden states. h: (N, D); W: (D, V); b: (V,);
    labels: (N,) int32 -> (N,) float32."""
    ce, _ = _fwd_impl(h, W, b, labels, chunk)
    return ce


def _op_dtype(h):
    """Matmul operand dtype policy: follow low-precision activations
    (bf16 operands -> full MXU rate, f32 accumulate); anything else f32."""
    return jnp.bfloat16 if h.dtype == jnp.bfloat16 else jnp.float32


def _fwd_impl(h, W, b, labels, chunk):
    od = _op_dtype(h)
    h_op = h.astype(od)
    W_op = W.astype(od)
    b32 = b.astype(jnp.float32)
    Wp, bp, vp = _pad_vocab(W_op, b32, chunk)
    n = h.shape[0]
    nc = vp // chunk

    gold = (jnp.einsum("nd,dn->n", h_op, W_op[:, labels],
                       preferred_element_type=jnp.float32)
            + b32[labels])

    # chunks are taken by dynamic_slice along the (minor) vocab axis — a
    # view-like slice in W's native layout, instead of a reshape+transpose
    # that would materialize a relaid-out copy of the whole table per step
    def body(carry, idx):
        m, s = carry
        Wk = jax.lax.dynamic_slice(Wp, (0, idx * chunk),
                                   (Wp.shape[0], chunk))
        bk = jax.lax.dynamic_slice(bp, (idx * chunk,), (chunk,))
        lg = jnp.dot(h_op, Wk, preferred_element_type=jnp.float32) \
            + bk[None, :]                               # (N, C) transient
        cm = jnp.max(lg, axis=-1)
        nm = jnp.maximum(m, cm)
        s = s * jnp.exp(m - nm) + jnp.sum(
            jnp.exp(lg - nm[:, None]), axis=-1)
        return (nm, s), None

    init = (jnp.full((n,), NEG, jnp.float32), jnp.zeros((n,), jnp.float32))
    (m, s), _ = jax.lax.scan(body, init, jnp.arange(nc))
    lse = m + jnp.log(s)
    return lse - gold, lse


def _fused_fwd(h, W, b, labels, chunk):
    ce, lse = _fwd_impl(h, W, b, labels, chunk)
    return ce, (h, W, b, labels, lse)


def _fused_bwd(chunk, res, g):
    h, W, b, labels, lse = res
    od = _op_dtype(h)
    h_op = h.astype(od)
    W_op = W.astype(od)
    b32 = b.astype(jnp.float32)
    Wp, bp, vp = _pad_vocab(W_op, b32, chunk)
    d = W.shape[0]
    v = W.shape[1]
    nc = vp // chunk
    g32 = g.astype(jnp.float32)

    def body(carry, idx):
        dh, dW, db = carry
        Wk = jax.lax.dynamic_slice(Wp, (0, idx * chunk), (d, chunk))
        bk = jax.lax.dynamic_slice(bp, (idx * chunk,), (chunk,))
        lg = jnp.dot(h_op, Wk, preferred_element_type=jnp.float32) \
            + bk[None, :]
        p = jnp.exp(lg - lse[:, None]) * g32[:, None]    # (N, C) transient
        p_op = p.astype(od)
        dh = dh + jnp.dot(p_op, Wk.T, preferred_element_type=jnp.float32)
        dW = jax.lax.dynamic_update_slice(
            dW, jnp.dot(h_op.T, p_op, preferred_element_type=jnp.float32),
            (0, idx * chunk))
        db = jax.lax.dynamic_update_slice(db, jnp.sum(p, axis=0),
                                          (idx * chunk,))
        return (dh, dW, db), None

    (dh, dW, db), _ = jax.lax.scan(
        body,
        (jnp.zeros((h.shape[0], d), jnp.float32),
         jnp.zeros((d, vp), jnp.float32),
         jnp.zeros((vp,), jnp.float32)),
        jnp.arange(nc))
    dW = dW[:, :v]
    db = db[:v]

    # the -onehot part of (softmax - onehot)
    Wl = W_op[:, labels].astype(jnp.float32)              # (D, N)
    dh = dh - (g32[:, None] * Wl.T)
    dW = dW.at[:, labels].add(-(h_op.astype(jnp.float32)
                                * g32[:, None]).T)
    db = db.at[labels].add(-g32)

    return dh.astype(h.dtype), dW.astype(W.dtype), db.astype(b.dtype), None


fused_softmax_xent.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hybrid_softmax_xent(h, W, b, labels, chunk: int = 2048):
    """Pallas online-softmax FORWARD + lax.scan BACKWARD — the production
    CE path at dispatching row counts. Measured on v5e (fwd+bwd of the
    mean CE, vocab 22,234, bf16 operands, dispatch-amortized):

        D=128/N=7680:  hybrid 4.05 ms  vs scan 4.28  vs all-Pallas 4.74
        D=512/N=15360: hybrid 11.99    vs scan 13.57 vs all-Pallas 13.33
        D=768/N=15360: hybrid 16.28    vs scan 17.87 vs all-Pallas 18.56

    Why this split wins: the Pallas forward keeps chunk logits in VMEM
    with one (TN,1) accumulator write-back per row tile, while the
    all-Pallas backward pays TWO logits recomputes (separate dh and
    dW/db kernels); the scan backward computes dh and dW/db in ONE
    recompute pass. Forward tiles are fixed (512, 2048) — without the
    dW kernel's (D, TV) f32 output block the forward fits scoped VMEM
    at every model width benched (D<=768; tv drops to 1024 beyond)."""
    ce, _ = _hybrid_fwd_dispatch(h, W, b, labels)
    return ce


def _hybrid_fwd_dispatch(h, W, b, labels):
    from deepsc_gan_tpu.ops.pallas.ce import _fwd_dispatch

    tv = 2048 if h.shape[1] <= 768 else 1024
    return _fwd_dispatch(h, W, b, labels, 512, tv)


def _hybrid_fwd(h, W, b, labels, chunk):
    ce, lse = _hybrid_fwd_dispatch(h, W, b, labels)
    return ce, (h, W, b, labels, lse)


hybrid_softmax_xent.defvjp(_hybrid_fwd, _fused_bwd)


def fused_ce_loss(
    hidden: jnp.ndarray,
    W: jnp.ndarray,
    b: jnp.ndarray,
    real: jnp.ndarray,
    pad_idx: int = 0,
    extra_masked_ids: Optional[Sequence[int]] = None,
    chunk: int = 2048,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Reference-parity masked CE (see ops.losses.loss_function) computed
    from decoder HIDDEN states + final-projection weights, fused.
    hidden: (B, L, D); W: (D, V); b: (V,); real: (B, L).

    Label smoothing adds `alpha*(logit_gold - mean_v logit_v)` per row — both
    terms are O(N*D) (a label gather and a matvec against the vocab-mean
    column W.mean(axis=1)), so they ride standard autodiff OUTSIDE the
    online-softmax custom VJP without touching the streamed vocab pass."""
    from deepsc_gan_tpu.ops.pallas.ce import (
        ce_kernel_mode,
        pallas_softmax_xent,
    )

    bsz, length, dim = hidden.shape
    flat_labels = real.reshape(-1).astype(jnp.int32)
    mode = ce_kernel_mode()
    # measured on v5e (see hybrid_softmax_xent): the scan path edges out
    # everything at small N (XLA pipelines the scan well; flagship
    # B=64*L=30=1920 rows); from ~4096 rows the HYBRID (Pallas fwd +
    # scan bwd) is fastest at every model width. "interpret" keeps the
    # full Pallas kernels (incl. the bwd kernels) under test on CPU.
    if mode == "interpret":
        ce = pallas_softmax_xent(hidden.reshape(-1, dim), W, b, flat_labels)
    elif mode == "pallas" and bsz * length >= 4096:
        ce = hybrid_softmax_xent(hidden.reshape(-1, dim), W, b, flat_labels,
                                 chunk)
    else:
        ce = fused_softmax_xent(hidden.reshape(-1, dim), W, b, flat_labels,
                                chunk)
    ce = ce.reshape(bsz, length)
    if label_smoothing:
        h32 = hidden.reshape(-1, dim).astype(jnp.float32)
        W32 = W.astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        gold = (jnp.einsum("nd,dn->n", h32, W32[:, flat_labels])
                + b32[flat_labels])
        mean_logits = h32 @ jnp.mean(W32, axis=1) + jnp.mean(b32)
        ce = ce + label_smoothing * (gold - mean_logits).reshape(bsz, length)
    mask = (real != pad_idx).astype(jnp.float32)
    if extra_masked_ids:
        for tid in extra_masked_ids:
            mask = mask * (real != tid).astype(jnp.float32)
    return jnp.mean(ce * mask)
