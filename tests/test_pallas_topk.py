"""Fused beam-candidate scorer (ops/pallas/topk.py): interpreter-mode
parity with the materialized-logits XLA fallback — values, indices
(incl. tie-breaks), and the logsumexp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.ops.pallas.topk import (
    set_topk_kernel_mode,
    topk_kernel_mode,
    topk_logits,
)


@pytest.fixture(autouse=True)
def _mode():
    set_topk_kernel_mode("interpret")
    yield
    set_topk_kernel_mode("auto")


def _case(n, d, v, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    h = jax.random.normal(ks[0], (n, d))
    W = jax.random.normal(ks[1], (d, v)) * 0.3
    b = jax.random.normal(ks[2], (v,)) * 0.1
    return h, W, b


def _dense_reference(h, W, b, k):
    """lax.top_k over the materialized logits + exact lse."""
    logits = np.asarray(h @ W + b, np.float32)
    order = np.argsort(-logits, axis=-1, kind="stable")[:, :k]
    vals = np.take_along_axis(logits, order, axis=-1)
    m = logits.max(axis=-1)
    lse = m + np.log(np.exp(logits - m[:, None]).sum(axis=-1))
    return vals, order.astype(np.int32), lse


@pytest.mark.parametrize("n,d,v,tn,tv", [
    (16, 8, 40, 8, 16),     # padding on both axes
    (24, 16, 64, 8, 32),    # exact tiles
    (10, 8, 50, 16, 32),    # n < tile
    (7, 8, 17, 8, 16),      # vocab < tile, odd sizes
])
@pytest.mark.parametrize("k", [1, 4])
def test_matches_dense(n, d, v, tn, tv, k):
    h, W, b = _case(n, d, v)
    vals, idx, lse = topk_logits(h, W, b, k, tn, tv)
    ev, ei, el = _dense_reference(h, W, b, k)
    np.testing.assert_array_equal(np.asarray(idx), ei)
    np.testing.assert_allclose(np.asarray(vals), ev, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), el, atol=2e-5, rtol=1e-5)
    # vals - lse is the log-softmax at the selected positions
    ls = np.asarray(jax.nn.log_softmax(jnp.asarray(h @ W + b,
                                                   jnp.float32)))
    np.testing.assert_allclose(np.asarray(vals - lse[:, None]),
                               np.take_along_axis(ls, ei, axis=-1),
                               atol=2e-5, rtol=1e-5)


def test_tie_break_lowest_index_across_tiles():
    """Exact duplicate maxima — including across vocab-tile boundaries —
    must resolve to the LOWEST vocab index (masked-argmax semantics)."""
    n, d, v, k = 4, 4, 32, 4
    h = jnp.ones((n, d))
    W = jnp.zeros((d, v))
    b = jnp.zeros((v,)).at[jnp.array([3, 19, 27])].set(1.0)  # tiles of 16
    vals, idx, _ = topk_logits(h, W, b, k, tn=8, tv=16)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.tile([3, 19, 27, 0], (n, 1)))
    np.testing.assert_allclose(np.asarray(vals),
                               np.tile([1.0, 1.0, 1.0, 0.0], (n, 1)),
                               atol=1e-6)


def test_xla_fallback_matches_interpret():
    h, W, b = _case(12, 8, 48, key=3)
    got = topk_logits(h, W, b, 4, tn=8, tv=16)
    set_topk_kernel_mode("xla")
    want = topk_logits(h, W, b, 4)
    for a, c in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-5)


def test_bfloat16_operands():
    """Serving path runs bf16 operands; indices must still be exact vs
    the XLA fallback at the same operand dtype."""
    h, W, b = _case(16, 8, 64, key=5)
    h, W = h.astype(jnp.bfloat16), W.astype(jnp.bfloat16)
    gi = topk_logits(h, W, b, 4, tn=8, tv=32)
    set_topk_kernel_mode("xla")
    xi = topk_logits(h, W, b, 4)
    np.testing.assert_array_equal(np.asarray(gi[1]), np.asarray(xi[1]))
    np.testing.assert_allclose(np.asarray(gi[0]), np.asarray(xi[0]),
                               atol=2e-2)


def test_mode_control():
    set_topk_kernel_mode("xla")
    assert topk_kernel_mode() == "xla"
    with pytest.raises(ValueError):
        set_topk_kernel_mode("nope")
    set_topk_kernel_mode("auto")
    assert topk_kernel_mode() in ("xla", "pallas")
