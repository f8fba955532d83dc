"""Pallas fused-CE kernels: interpreter-mode value+grad parity with the
naive dense CE (the compiled kernels run on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.ops.losses import cross_entropy_per_token
from deepsc_gan_tpu.ops.pallas.ce import (
    ce_kernel_mode,
    pallas_softmax_xent,
    set_ce_kernel_mode,
)


@pytest.fixture(autouse=True)
def _mode():
    set_ce_kernel_mode("interpret")
    yield
    set_ce_kernel_mode("auto")


def _case(n, d, v, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    h = jax.random.normal(ks[0], (n, d))
    W = jax.random.normal(ks[1], (d, v)) * 0.3
    b = jax.random.normal(ks[2], (v,)) * 0.1
    labels = jax.random.randint(ks[3], (n,), 0, v)
    return h, W, b, labels


@pytest.mark.parametrize("n,d,v,tn,tv", [
    (16, 8, 40, 8, 16),     # padding on both axes
    (24, 16, 64, 8, 32),    # exact tiles
    (10, 8, 50, 16, 32),    # n < tile
])
def test_forward_matches_dense(n, d, v, tn, tv):
    h, W, b, labels = _case(n, d, v)
    got = pallas_softmax_xent(h, W, b, labels, tn, tv)
    want = cross_entropy_per_token(labels[None], (h @ W + b)[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_grads_match_dense():
    n, d, v, tn, tv = 12, 8, 40, 8, 16
    h, W, b, labels = _case(n, d, v, key=3)
    weights = jax.random.uniform(jax.random.PRNGKey(9), (n,))

    def via_kernel(h, W, b):
        return jnp.sum(pallas_softmax_xent(h, W, b, labels, tn, tv)
                       * weights)

    def dense(h, W, b):
        return jnp.sum(
            cross_entropy_per_token(labels[None], (h @ W + b)[None])[0]
            * weights)

    g1 = jax.grad(via_kernel, argnums=(0, 1, 2))(h, W, b)
    g2 = jax.grad(dense, argnums=(0, 1, 2))(h, W, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-5,
                                   rtol=1e-4)


def test_hybrid_value_and_grads_match_dense():
    """The production hybrid (Pallas fwd + scan bwd) must agree with the
    naive dense CE on both the value and all three gradients."""
    from deepsc_gan_tpu.ops.fused_ce import hybrid_softmax_xent

    n, d, v = 12, 8, 40
    h, W, b, labels = _case(n, d, v, key=7)
    weights = jax.random.uniform(jax.random.PRNGKey(11), (n,))

    got = hybrid_softmax_xent(h, W, b, labels)
    want = cross_entropy_per_token(labels[None], (h @ W + b)[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    def via_hybrid(h, W, b):
        return jnp.sum(hybrid_softmax_xent(h, W, b, labels) * weights)

    def dense(h, W, b):
        return jnp.sum(
            cross_entropy_per_token(labels[None], (h @ W + b)[None])[0]
            * weights)

    g1 = jax.grad(via_hybrid, argnums=(0, 1, 2))(h, W, b)
    g2 = jax.grad(dense, argnums=(0, 1, 2))(h, W, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-5,
                                   rtol=1e-4)


def test_mode_control():
    set_ce_kernel_mode("scan")
    assert ce_kernel_mode() == "scan"
    with pytest.raises(ValueError):
        set_ce_kernel_mode("nope")
    set_ce_kernel_mode("auto")
    assert ce_kernel_mode() in ("scan", "pallas")


def test_fused_ce_loss_dispatches_to_kernel(tiny_cfg, tiny_batch):
    """Train-step loss through the interpreted kernel == scan path."""
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import create_train_state, make_train_step

    cfg = tiny_cfg.replace(ce_chunk=16)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    results = {}
    for mode in ("scan", "interpret"):
        set_ce_kernel_mode(mode)
        step = make_train_step(model, cfg)
        s2, loss = step(state, tiny_batch, tiny_batch,
                        jax.random.PRNGKey(5), 0.1)
        results[mode] = (float(loss), s2.params)
    assert np.isclose(results["scan"][0], results["interpret"][0],
                      atol=1e-5)
    for a, b in zip(jax.tree.leaves(results["scan"][1]),
                    jax.tree.leaves(results["interpret"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
