"""GAN perturbation generator / discriminator networks.

Behavioral spec from the reference (`DeepSC-GAN/models/gan.py:4-65`):
- Generator G: Dense 256(ReLU) -> Dense 16, then HALF-power normalization
  x / sqrt(2*mean(x^2)) — the perturbation carries half unit power.
- Discriminator D: Dense 32 -> 32 -> 16 MLP (defined in the reference but
  unused by its committed training step — the receiver itself plays the
  discriminator role; kept for API parity).
- CNN variants with 2x Conv1D + LayerNorm + dense + norm.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from deepsc_gan_tpu.models.channel import power_normalize


class Generator(nn.Module):
    """Perturbation generator (reference `G`, gan.py:4-16)."""

    hidden: int = 256
    out_dim: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc0")(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        return power_normalize(x.astype(jnp.float32), half=True).astype(self.dtype)


class Discriminator(nn.Module):
    """MLP discriminator (reference `D`, gan.py:18-30)."""

    hidden: int = 32
    out_dim: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc1")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class GeneratorCNN(nn.Module):
    """Conv1D generator variant (reference `G_CNN`, gan.py:32-48)."""

    filters: int = 16
    kernel: int = 16
    out_dim: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda name: nn.Conv(self.filters, (self.kernel,), padding="SAME",
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        x = conv("cnn1")(x)
        x = conv("cnn2")(x)
        # reference normalizes over the sequence axis (axis=1)
        x = nn.LayerNorm(reduction_axes=1, feature_axes=1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc")(x)
        return power_normalize(x.astype(jnp.float32), half=True).astype(self.dtype)


class DiscriminatorCNN(nn.Module):
    """Conv1D discriminator variant (reference `D_CNN`, gan.py:50-65)."""

    filters: int = 16
    kernel: int = 8
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda name: nn.Conv(self.filters, (self.kernel,), padding="SAME",
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        norm = nn.LayerNorm(reduction_axes=1, feature_axes=1, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm")
        x = conv("cnn1")(x)
        x = conv("cnn2")(x)
        x = norm(x)
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc")(x)
        # the reference applies the SAME LayerNorm instance twice — shared
        # params, matched here by reusing `norm`
        return norm(x)
