"""Fused vocab-projection+CE: value and gradient parity with the naive
path, masking semantics, odd vocab sizes (padding path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.ops.fused_ce import fused_ce_loss, fused_softmax_xent
from deepsc_gan_tpu.ops.losses import cross_entropy_per_token, loss_function
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step


@pytest.mark.parametrize("v,chunk", [(50, 16), (67, 32), (128, 128)])
def test_fused_xent_matches_naive(v, chunk):
    key = jax.random.PRNGKey(0)
    n, d = 24, 16
    h = jax.random.normal(key, (n, d))
    W = jax.random.normal(jax.random.PRNGKey(1), (d, v)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (v,)) * 0.1
    labels = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, v)

    got = fused_softmax_xent(h, W, b, labels, chunk)
    want = cross_entropy_per_token(labels[None], (h @ W + b)[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_xent_grads_match():
    key = jax.random.PRNGKey(0)
    n, d, v, chunk = 12, 8, 37, 16
    h = jax.random.normal(key, (n, d))
    W = jax.random.normal(jax.random.PRNGKey(1), (d, v)) * 0.3
    b = jnp.zeros((v,))
    labels = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, v)
    weights = jax.random.uniform(jax.random.PRNGKey(4), (n,))

    def fused(h, W, b):
        return jnp.sum(fused_softmax_xent(h, W, b, labels, chunk) * weights)

    def naive(h, W, b):
        return jnp.sum(
            cross_entropy_per_token(labels[None], (h @ W + b)[None])[0]
            * weights)

    g1 = jax.grad(fused, argnums=(0, 1, 2))(h, W, b)
    g2 = jax.grad(naive, argnums=(0, 1, 2))(h, W, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5,
                                   rtol=1e-4)


def test_fused_ce_loss_masking():
    """Matches loss_function's reference-parity masking (mean over ALL
    positions)."""
    key = jax.random.PRNGKey(0)
    bsz, length, d, v = 3, 5, 8, 21
    h = jax.random.normal(key, (bsz, length, d))
    W = jax.random.normal(jax.random.PRNGKey(1), (d, v)) * 0.3
    b = jnp.zeros((v,))
    real = jax.random.randint(jax.random.PRNGKey(2), (bsz, length), 0, v)
    real = real.at[:, -2:].set(0)  # pads

    got = fused_ce_loss(h, W, b, real, chunk=8)
    logits = jnp.einsum("bld,dv->blv", h, W) + b
    want = loss_function(real, logits)
    np.testing.assert_allclose(float(got), float(want), atol=2e-5,
                               rtol=1e-5)


def test_train_step_fused_vs_naive_same_result(tiny_cfg, tiny_batch):
    """A full train step with fused_ce on/off produces (numerically) the
    same loss and updated params."""
    results = {}
    for fused in (True, False):
        cfg = tiny_cfg.replace(fused_ce=fused, ce_chunk=16)
        model = make_model(cfg, "transformer")
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   batch_size=cfg.bs)
        step = make_train_step(model, cfg)
        state, loss = step(state, tiny_batch, tiny_batch,
                           jax.random.PRNGKey(5), 0.1)
        results[fused] = (float(loss), state.params)
    assert np.isclose(results[True][0], results[False][0], atol=1e-5)
    for a, b in zip(jax.tree.leaves(results[True][1]),
                    jax.tree.leaves(results[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
