"""Sinusoidal absolute positional encoding.

Matches the reference table (`DeepSC-GAN/models/modules.py:5-23`):
angle(pos, i) = pos / 10000^(2i/d_model), sin on even channels, cos on odd,
returned with a leading broadcast axis (1, positions, d_model).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(position: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    pos = np.arange(position)[:, None].astype(np.float32)
    i = np.arange(d_model)[None, :].astype(np.float32)
    angles = pos / np.power(10000.0, (2.0 * i) / np.float32(d_model))
    # NOTE (reference quirk, kept): the angle uses 2*i with the RAW channel
    # index i — not the usual 2*(i//2) — so even/odd channels at the same
    # "frequency pair" use different rates. Reproduced exactly for parity.
    angles[:, 0::2] = np.sin(angles[:, 0::2])
    angles[:, 1::2] = np.cos(angles[:, 1::2])
    return jnp.asarray(angles[None, ...], dtype=dtype)
