"""Differentiable channel simulation + dense channel codec.

Behavioral spec from the reference (`DeepSC-GAN/models/transceiver.py:13-113`),
re-designed as pure functions of an explicit PRNG key so that
- a fixed key gives bit-identical channel realizations (determinism is a
  BASELINE.json requirement),
- `jax.grad` flows through the channel naturally (the channel is the "air
  interface" every FGM/PGD attack differentiates through), and
- the same code runs under jit/vmap/shard_map without hidden state.

Channel math (AWGN, reference transceiver.py:25-33):
    y = x + N(0, n_std^2) + n_std * sqrt(PNR) * (sqrt(B*L*C) * p)
with PNR = 10^(PNR_dB/10). The perturbation p is pre-scaled by sqrt(total
size) — the reference convention for a unit-norm p so the per-element
perturbation power is PNR * n_std^2.

Fading (Rayleigh K=0 / Rician K=1, reference transceiver.py:35-83): the
signal is viewed as interleaved complex pairs, multiplied by a SINGLE
scalar complex fade h ~ CN(mean, std) shared by the whole batch (reference
draws h of shape (1,)), plus complex AWGN. Quirk Q3: the reference computes
LS/MMSE equalization but returns the UN-equalized y; `equalizer=None`
reproduces that, "LS"/"MMSE" return the equalized estimate. NOTE the
fading path ignores `p` entirely — faithful to the reference, where
`fading()` accepts p but never injects it.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def snr_to_noise(snr_db) -> jnp.ndarray:
    """SNR in dB -> noise std (reference utlis/tools.py:46-50)."""
    snr = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    return 1.0 / jnp.sqrt(snr)


def awgn(key, x, p, pnr_db, n_std=0.1) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    n_std = jnp.asarray(n_std, jnp.float32)
    pnr = 10.0 ** (jnp.asarray(pnr_db, jnp.float32) / 10.0)
    size = jnp.asarray(x.size, jnp.float32)
    noise = n_std * jax.random.normal(key, x.shape, jnp.float32)
    return x + noise + n_std * jnp.sqrt(pnr) * (jnp.sqrt(size) * p)


def fading(
    key,
    x,
    p,
    pnr_db,
    k_factor: float = 0.0,
    n_std=0.1,
    equalizer: Optional[str] = None,
    per_sample: bool = False,
) -> jnp.ndarray:
    """Flat (scalar) Rayleigh/Rician fading channel; k_factor is the Rician
    K (0 => Rayleigh). `p` accepted-and-unused, as in the reference.

    per_sample: draw an independent fade per batch row instead of the
    reference's single scalar per call (transceiver.py:49-51 draws shape
    (1,)). Same marginal fade statistics; 64x more fade realizations per
    training step, which is a pure sample-efficiency lever for learning
    fade-invariant codes. Keep False for reference-protocol evals."""
    del p  # reference fading never injects the perturbation
    x = x.astype(jnp.float32)
    bs, sent_len, d = x.shape
    n_std = jnp.asarray(n_std, jnp.float32)
    mean = math.sqrt(k_factor / (2.0 * (k_factor + 1.0)))
    std = math.sqrt(1.0 / (2.0 * (k_factor + 1.0)))

    xc = x.reshape(bs, -1, 2)
    x_complex = jax.lax.complex(xc[:, :, 0], xc[:, :, 1])

    kh, kn = jax.random.split(key)
    h_shape = (bs, 1, 2) if per_sample else (2,)
    h = mean + std * jax.random.normal(kh, h_shape, jnp.float32)
    h_complex = jax.lax.complex(h[..., 0], h[..., 1])

    n = n_std * jax.random.normal(kn, xc.shape, jnp.float32)
    n_complex = jax.lax.complex(n[:, :, 0], n[:, :, 1])

    y_complex = x_complex * h_complex + n_complex

    if equalizer is None:
        out = y_complex  # quirk Q3: reference returns the raw channel output
    elif equalizer == "LS":
        out = y_complex * jnp.conj(h_complex) / (h_complex * jnp.conj(h_complex))
    elif equalizer == "MMSE":
        denom = h_complex * jnp.conj(h_complex) + (n_std * n_std * 2.0)
        out = y_complex * jnp.conj(h_complex) / denom
    else:
        raise ValueError("equalizer must be None, 'LS' or 'MMSE'")

    y = jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
    return y.reshape(bs, sent_len, d)


def channel(
    key,
    x,
    p,
    pnr_db,
    n_std=0.1,
    kind: str = "AWGN",
    equalizer: Optional[str] = None,
    per_sample: bool = False,
) -> jnp.ndarray:
    """Dispatch like the reference `Channels.call` (transceiver.py:17-23):
    'AWGN' | 'Rayleigh' (K=0) | anything else => Rician (K=1). `kind` is a
    Python-level static argument — channel type never changes inside a
    jitted step."""
    if kind == "AWGN":
        return awgn(key, x, p, pnr_db, n_std)
    if kind == "Rayleigh":
        return fading(key, x, p, pnr_db, 0.0, n_std, equalizer, per_sample)
    return fading(key, x, p, pnr_db, 1.0, n_std, equalizer, per_sample)


def power_normalize(x: jnp.ndarray, half: bool = False) -> jnp.ndarray:
    """x / sqrt(mean(x^2)) — unit average power over the whole tensor
    (reference Channel_Encoder powernorm, transceiver.py:91). With
    half=True: x / sqrt(2*mean(x^2)) (the GAN generator's norm, gan.py:9)."""
    denom = jnp.sqrt((2.0 if half else 1.0) * jnp.mean(jnp.square(x)))
    return x / denom


class ChannelEncoder(nn.Module):
    """Dense 256(ReLU) -> Dense 16 -> power normalization
    (reference Channel_Encoder, transceiver.py:85-98)."""

    hidden: int = 256
    out_dim: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="dense0")(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense1")(x)
        # power norm in f32: it is the physical transmit-power constraint
        return power_normalize(x.astype(jnp.float32)).astype(self.dtype)


class ChannelDecoder(nn.Module):
    """Dense d_model(ReLU) -> Dense 512(ReLU) -> Dense d_model, residual
    LayerNorm over (x1 + x3) (reference Channel_Decoder,
    transceiver.py:100-113)."""

    d_model: int = 128
    hidden: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        y = y.astype(self.dtype)
        x1 = nn.relu(nn.Dense(self.d_model, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="dense1")(y))
        x2 = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="dense2")(x1))
        x3 = nn.Dense(self.d_model, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="dense3")(x2)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="layernorm1")(x1 + x3)
