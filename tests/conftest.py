"""Test config: force CPU backend with 8 virtual devices BEFORE jax import
(the standard fake-backend trick for multi-chip tests, SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU-tunnel platform and
# overrides JAX_PLATFORMS; pin the config to pure CPU after import so the
# 8 virtual devices take effect.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from deepsc_gan_tpu.utils.config import Config  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    """Small everything so compiles stay fast; structure preserved."""
    return Config(
        vocab_size=40, bs=4, seq_len=12, max_length=11,
        encoder_num_layer=2, decoder_num_layer=2,
        encoder_d_model=16, decoder_d_model=16,
        encoder_d_ff=32, decoder_d_ff=32,
        encoder_num_heads=2, decoder_num_heads=2,
        cycle_num=2, cycle_layers=2,
        channel_hidden=24, channel_dim=8, channel_dec_hidden=32,
        dtype="float32",
    )


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_batch(tiny_cfg, rng):
    import jax.numpy as jnp
    import numpy as np

    np_rng = np.random.default_rng(0)
    data = np.zeros((tiny_cfg.bs, tiny_cfg.seq_len), np.int32)
    for i in range(tiny_cfg.bs):
        L = int(np_rng.integers(5, tiny_cfg.seq_len + 1))
        data[i, 0] = tiny_cfg.start_idx
        data[i, 1:L - 1] = np_rng.integers(6, tiny_cfg.vocab_size,
                                           size=L - 2)
        data[i, L - 1] = tiny_cfg.end_idx
    return jnp.asarray(data)
