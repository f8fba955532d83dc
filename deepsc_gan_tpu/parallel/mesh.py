"""Device mesh construction.

The reference has ZERO distributed components (SURVEY.md §2: no
tf.distribute / NCCL / MPI anywhere — single-notebook code). This layer is
the new first-class TPU capability owed by the rebuild (SURVEY.md §5.8):
a `jax.sharding.Mesh` over ICI with named axes

    dp  — data parallel (batch sharding, gradient psum over ICI)
    snr — SNR-sweep parallel for evaluation (each slice of devices
          evaluates a different SNR point of the BLEU-vs-SNR curve)

On a single host the mesh spans the local devices; under
`jax.distributed` (multi-host) it spans the global device set, with the
dp axis laid out innermost so gradient all-reduce rides ICI, not DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, snr: int = 1,
              devices: Optional[Sequence] = None,
              axis_names=("snr", "dp")) -> Mesh:
    """Build an (snr, dp) mesh. With defaults, all devices go to dp.

    dp is innermost (fastest-varying over physically adjacent devices) so
    the per-step gradient all-reduce — the latency-critical collective —
    stays on the shortest ICI paths; the snr axis only synchronizes at
    sweep boundaries."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // snr
    if dp * snr > n:
        raise ValueError(f"dp*snr = {dp}*{snr} > {n} devices")
    arr = np.array(devices[: dp * snr]).reshape(snr, dp)
    return Mesh(arr, axis_names)


def local_mesh(n: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first n local devices."""
    devices = jax.devices()[: n or len(jax.devices())]
    return Mesh(np.array(devices), (axis_name,))
