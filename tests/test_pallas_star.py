"""Pallas star-satellite kernel: interpreter-mode equivalence with the XLA
path (CPU tests; the compiled kernel runs on real TPU)."""

import jax
import numpy as np
import pytest

from deepsc_gan_tpu.ops.pallas.star import (
    _xla_satellite,
    set_star_kernel_mode,
    star_kernel_mode,
    star_satellite_attention,
)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_star_kernel_mode("auto")


def _inputs(b=2, l=6, d=32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, l, d))
    k_ctx = jax.random.normal(ks[1], (5, b, l, d))
    v_ctx = jax.random.normal(ks[2], (5, b, l, d))
    return q, k_ctx, v_ctx


def test_mode_control():
    set_star_kernel_mode("xla")
    assert star_kernel_mode() == "xla"
    with pytest.raises(ValueError):
        set_star_kernel_mode("bogus")
    set_star_kernel_mode("auto")
    assert star_kernel_mode() in ("xla", "pallas")


def test_interpret_matches_xla():
    q, k_ctx, v_ctx = _inputs()
    set_star_kernel_mode("xla")
    want = star_satellite_attention(q, k_ctx, v_ctx, num_heads=4)
    set_star_kernel_mode("interpret")
    got = star_satellite_attention(q, k_ctx, v_ctx, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_interpret_matches_xla_reference_shape():
    """d_model=128 / 8 heads — the reference model geometry (rows padded
    to the 256-row tile inside the wrapper)."""
    q, k_ctx, v_ctx = _inputs(b=4, l=31, d=128, key=7)
    set_star_kernel_mode("xla")
    want = star_satellite_attention(q, k_ctx, v_ctx, num_heads=8)
    set_star_kernel_mode("interpret")
    got = star_satellite_attention(q, k_ctx, v_ctx, num_heads=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_xla_helper_is_softmax_attention():
    """_xla_satellite against a hand-rolled softmax over the 5 slots."""
    q, k_ctx, v_ctx = _inputs(b=1, l=3, d=8)
    out = _xla_satellite(q.reshape(3, 8), k_ctx.reshape(5, 3, 8),
                         v_ctx.reshape(5, 3, 8), num_heads=2)
    # manual: per row, per head
    qh = np.asarray(q).reshape(3, 2, 4)
    kh = np.asarray(k_ctx).reshape(5, 3, 2, 4)
    vh = np.asarray(v_ctx).reshape(5, 3, 2, 4)
    want = np.zeros_like(qh)
    for n in range(3):
        for h in range(2):
            s = np.array([qh[n, h] @ kh[j, n, h] for j in range(5)]) / 2.0
            w = np.exp(s - s.max())
            w = w / w.sum()
            want[n, h] = sum(w[j] * vh[j, n, h] for j in range(5))
    np.testing.assert_allclose(np.asarray(out).reshape(3, 2, 4), want,
                               atol=1e-5)


def test_star_layer_runs_with_interpret_kernel(tiny_cfg, tiny_batch):
    """Full star transceiver forward through the interpreted kernel."""
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import create_train_state

    set_star_kernel_mode("xla")
    cfg = tiny_cfg
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    from deepsc_gan_tpu.ops.masks import create_padding_mask
    enc_m = create_padding_mask(tiny_batch)
    tx_x = model.apply({"params": state.params}, tiny_batch, enc_m,
                       deterministic=True, method="encode")
    set_star_kernel_mode("interpret")
    tx_p = model.apply({"params": state.params}, tiny_batch, enc_m,
                       deterministic=True, method="encode")
    np.testing.assert_allclose(np.asarray(tx_x), np.asarray(tx_p),
                               atol=1e-4, rtol=1e-3)


def test_custom_vjp_matches_autodiff_of_xla_math():
    """Gradients through star_satellite_attention (custom VJP) must match
    plain autodiff of the equivalent XLA math."""
    import jax.numpy as jnp

    q, k_ctx, v_ctx = _inputs(b=2, l=5, d=16, key=11)
    H = 4

    def via_op(q, k, v):
        set_star_kernel_mode("xla")
        return jnp.sum(star_satellite_attention(q, k, v, H) ** 2)

    def via_math(q, k, v):
        b, l, d = q.shape
        out = _xla_satellite(q.reshape(b * l, d), k.reshape(5, b * l, d),
                             v.reshape(5, b * l, d), H).reshape(b, l, d)
        return jnp.sum(out ** 2)

    g1 = jax.grad(via_op, argnums=(0, 1, 2))(q, k_ctx, v_ctx)
    g2 = jax.grad(via_math, argnums=(0, 1, 2))(q, k_ctx, v_ctx)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def test_star_train_step_differentiates_through_kernel(tiny_cfg, tiny_batch):
    """Full star train step with the interpreted Pallas kernel in the
    forward (the path that failed on TPU before the custom VJP)."""
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import create_train_state, make_train_step

    set_star_kernel_mode("interpret")
    cfg = tiny_cfg
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg, full_target=True)
    state, loss = step(state, tiny_batch, tiny_batch, jax.random.PRNGKey(1),
                       0.1)
    assert np.isfinite(float(loss))
