"""MINE — Mutual Information Neural Estimation.

The reference imports `sample_batch` and `mutual_information` from its
transceiver module (`DeepSC-GAN/utlis/trainer.py:4`) and exposes a
`--train-with-mine` flag (`utlis/parameters.py:24-25`), but the
implementation lives only in the upstream DeepSC repo — quirk Q6 in
SURVEY.md §7. This module supplies a fresh implementation of the standard
MINE estimator (Belghazi et al., 2018) as used by DeepSC: a statistics
network T(x, y) trained so that

    I(X; Y) >= E_joint[T] - log E_marginal[e^T]

between the transmitted channel symbols x and the received symbols y.
Training maximizes the bound w.r.t. T's parameters, and optionally adds
`-mine_lambda * MI` to the transceiver loss so the codec maximizes channel
mutual information.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MINE(nn.Module):
    """Statistics network T(x, y): MLP on the concatenated flattened
    symbol vectors."""

    hidden: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # x, y: (B, ...) — flattened per sample and concatenated
        b = x.shape[0]
        inputs = jnp.concatenate(
            [x.reshape(b, -1), y.reshape(b, -1)], axis=-1
        ).astype(self.dtype)
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc0")(inputs))
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc1")(h))
        return nn.Dense(1, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc2")(h)[:, 0]


def sample_batch(key, x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Produce the marginal pairing: y re-shuffled along the batch axis so
    (x, y_shuffled) ~ p(x)p(y). Joint pairs are just (x, y)."""
    perm = jax.random.permutation(key, x.shape[0])
    return x, y[perm]


def mutual_information(t_joint: jnp.ndarray, t_marginal: jnp.ndarray) -> jnp.ndarray:
    """Donsker-Varadhan lower bound from statistics-network outputs."""
    return jnp.mean(t_joint) - (
        jax.nn.logsumexp(t_marginal) - jnp.log(t_marginal.shape[0])
    )


def mine_loss(params, mine_model: MINE, key, x, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (loss for T's optimizer = -MI bound, the MI estimate)."""
    xm, ym = sample_batch(key, x, y)
    t_joint = mine_model.apply(params, x, y)
    t_marg = mine_model.apply(params, xm, ym)
    mi = mutual_information(t_joint, t_marg)
    return -mi, mi
