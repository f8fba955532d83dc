"""Channel subsystem: noise statistics, power norm, PNR scaling,
determinism (test plan per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.channel import (
    awgn,
    channel,
    fading,
    power_normalize,
    snr_to_noise,
)


def test_snr_to_noise():
    assert np.isclose(float(snr_to_noise(0)), 1.0)
    assert np.isclose(float(snr_to_noise(20)), 0.1)
    assert np.isclose(float(snr_to_noise(3)), 1 / np.sqrt(10 ** 0.3))


def test_power_normalize_unit_power():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 31, 16)) * 3.7
    y = power_normalize(x)
    assert np.isclose(float(jnp.mean(y * y)), 1.0, atol=1e-5)
    yh = power_normalize(x, half=True)
    assert np.isclose(float(jnp.mean(yh * yh)), 0.5, atol=1e-5)


def test_awgn_noise_power():
    x = jnp.zeros((64, 31, 16))
    p = jnp.zeros_like(x)
    n_std = 0.3
    y = awgn(jax.random.PRNGKey(0), x, p, 0.0, n_std)
    assert np.isclose(float(jnp.std(y)), n_std, rtol=0.05)


def test_awgn_pnr_scaling():
    """y = x + noise + n_std*sqrt(PNR)*sqrt(size)*p
    (reference transceiver.py:29-32)."""
    x = jnp.zeros((2, 3, 4))
    p = jnp.ones_like(x)
    n_std = 0.5
    pnr_db = 6.0
    key = jax.random.PRNGKey(1)
    y = awgn(key, x, p, pnr_db, n_std)
    noise = n_std * jax.random.normal(key, x.shape, jnp.float32)
    expected = noise + n_std * np.sqrt(10 ** 0.6) * np.sqrt(x.size)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               atol=1e-5)


def test_awgn_deterministic_at_fixed_key():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 4))
    p = jnp.zeros_like(x)
    y1 = awgn(jax.random.PRNGKey(42), x, p, 0.0, 0.1)
    y2 = awgn(jax.random.PRNGKey(42), x, p, 0.0, 0.1)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = awgn(jax.random.PRNGKey(43), x, p, 0.0, 0.1)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_fading_shapes_and_determinism():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 4))
    p = jnp.zeros_like(x)
    y1 = fading(jax.random.PRNGKey(1), x, p, 0.0, 0.0, 0.1)
    assert y1.shape == x.shape
    y2 = fading(jax.random.PRNGKey(1), x, p, 0.0, 0.0, 0.1)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_rayleigh_fade_statistics():
    """Scalar complex fade h ~ CN(0, 1) for K=0: |h|^2 mean ~= 1 over many
    channel draws; signal power scales by |h|^2 at zero noise."""
    x = jnp.ones((1, 64, 2))
    p = jnp.zeros_like(x)
    gains = []
    for i in range(500):
        y = fading(jax.random.PRNGKey(i), x, p, 0.0, 0.0, n_std=0.0)
        gains.append(float(jnp.mean(y[..., 0] ** 2 + y[..., 1] ** 2) / 2.0))
    # E[|h|^2] = 2 * std^2 = 1 for K=0
    assert np.isclose(np.mean(gains), 1.0, rtol=0.15)


def test_rician_k1_mean_component():
    """K=1: h has mean sqrt(K/(2(K+1))) = 0.5 per component."""
    x = jnp.ones((1, 4, 2))
    p = jnp.zeros_like(x)
    hs = []
    for i in range(800):
        y = fading(jax.random.PRNGKey(i), x, p, 0.0, 1.0, n_std=0.0)
        # x = 1+1j everywhere -> y = (1+1j)*h; recover h
        yc = complex(float(y[0, 0, 0]), float(y[0, 0, 1]))
        hs.append(yc / complex(1, 1))
    mean = np.mean(hs)
    assert np.isclose(mean.real, 0.5, atol=0.05)
    assert np.isclose(mean.imag, 0.5, atol=0.05)


def test_equalizer_ls_recovers_signal():
    """Quirk Q3: default returns UN-equalized y; LS at zero noise must
    recover x exactly."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
    p = jnp.zeros_like(x)
    key = jax.random.PRNGKey(5)
    y_raw = fading(key, x, p, 0.0, 0.0, n_std=0.0, equalizer=None)
    y_ls = fading(key, x, p, 0.0, 0.0, n_std=0.0, equalizer="LS")
    assert not np.allclose(np.asarray(y_raw), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(y_ls), np.asarray(x), atol=1e-4)


def test_channel_dispatch():
    x = jnp.ones((2, 4, 4))
    p = jnp.zeros_like(x)
    k = jax.random.PRNGKey(0)
    for kind in ("AWGN", "Rayleigh", "Rician"):
        y = channel(k, x, p, 0.0, 0.1, kind=kind)
        assert y.shape == x.shape
    with pytest.raises(ValueError):
        fading(k, x, p, 0.0, 0.0, 0.1, equalizer="bogus")


def test_channel_differentiable():
    """The channel is the 'air interface' every attack differentiates
    through — grad must flow."""
    x = jnp.ones((1, 4, 2))

    def f(x):
        return jnp.sum(channel(jax.random.PRNGKey(0), x,
                               jnp.zeros_like(x), 0.0, 0.1, "Rayleigh")**2)

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fading_per_sample_draws_independent_fades():
    """per_sample=True: each batch row gets its own fade (the training
    sample-efficiency lever); per_sample=False (default, reference
    protocol, transceiver.py:49-51) applies ONE scalar fade to all rows.
    Marginal statistics match in both modes."""
    x = jnp.ones((16, 8, 2))
    p = jnp.zeros_like(x)
    y_scalar = fading(jax.random.PRNGKey(0), x, p, 0.0, 0.0, n_std=0.0)
    y_per = fading(jax.random.PRNGKey(0), x, p, 0.0, 0.0, n_std=0.0,
                   per_sample=True)
    # scalar mode: every row identical; per-sample mode: rows differ
    row_var_scalar = float(jnp.var(y_scalar[:, 0, 0]))
    row_var_per = float(jnp.var(y_per[:, 0, 0]))
    assert row_var_scalar < 1e-12
    assert row_var_per > 1e-3
    # within a row the fade is constant in both modes
    np.testing.assert_allclose(np.asarray(y_per[0, 0]),
                               np.asarray(y_per[0, -1]), rtol=1e-5)
    # Rayleigh marginal: E[|h|^2] = 1 across rows
    gains = []
    for i in range(60):
        y = fading(jax.random.PRNGKey(i), x, p, 0.0, 0.0, n_std=0.0,
                   per_sample=True)
        gains.append(np.mean(np.asarray(
            y[..., 0] ** 2 + y[..., 1] ** 2)) / 2.0)
    assert np.isclose(np.mean(gains), 1.0, rtol=0.15)


def test_fading_per_sample_equalizers_broadcast():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 4))
    p = jnp.zeros_like(x)
    for eq in ("LS", "MMSE"):
        y = fading(jax.random.PRNGKey(1), x, p, 0.0, 1.0, n_std=0.0,
                   equalizer=eq, per_sample=True)
        assert y.shape == x.shape
    # LS with zero noise inverts the per-row fade exactly
    y = fading(jax.random.PRNGKey(1), x, p, 0.0, 1.0, n_std=0.0,
               equalizer="LS", per_sample=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
