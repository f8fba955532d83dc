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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` with explicit args
    or the standard env autodetection (TPU pods set everything via the
    metadata server; GKE/SLURM via JAX_COORDINATOR_ADDRESS etc.). After
    this, `jax.devices()` is the GLOBAL device set and the meshes built by
    `make_mesh` span hosts — dp innermost keeps the gradient all-reduce on
    ICI; only input dispatch crosses DCN. Idempotent: a second call is a
    no-op."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # single-process run (no coordinator configured): fine, stay local.
        # "already"/"once" both mean a prior initialize — keep the
        # documented idempotency even for explicit single-process args
        msg = str(e).lower()
        if ("already" not in msg and "once" not in msg
                and coordinator_address):
            raise
