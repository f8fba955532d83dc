"""Two-controller (multi-host) training demo on CPU.

Launches itself as 2 processes, each with 4 virtual CPU devices; both
join one jax.distributed cluster (Gloo collectives over localhost — the
same multi-controller code path a TPU pod uses over DCN, SURVEY.md §5.8)
and run the framework's OWN train step over the global 8-device mesh.
The parent then re-runs the identical workload single-process on 8
local devices and asserts the per-step losses match — multi-controller
execution is bit-equivalent to single-controller GSPMD.

Two modes:
  --mode dp  (default): `make_parallel_train_step` over a dp=8 mesh —
      params replicated via `replicate_global`, each process feeding its
      local half of the batch via `shard_batch_global`, XLA inserting
      the cross-process gradient all-reduce.
  --mode pp: `make_pp_train_step` over a (pp=2, dp=4) mesh whose pp axis
      IS the process boundary — the GPipe ppermute microbatch schedule
      (and its transposed backward) crosses processes on every hop, the
      multi-controller analogue of a pipeline spanning pod slices over
      DCN. Pipeline-layout params are placed with
      jax.make_array_from_callback under the pp sharding rule.
  --mode tp: `make_tp_train_step` over a (tp=2, dp=4) mesh whose tp axis
      IS the process boundary — the vocab-parallel CE's pmax/psum
      collectives cross Gloo every step (and their transposes in the
      backward).

Usage: python scripts/multihost_demo.py [--mode dp|pp] [--steps 3]
[--port 29417] (the `worker` subcommand is internal).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEV = 4


def _pin_cpu(n_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{n_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def _losses(steps: int, seed: int = 0):
    """Run `steps` dp train steps on the current (global) device set and
    return the per-step losses. Identical program in both topologies."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.parallel.mesh import make_mesh
    from deepsc_gan_tpu.parallel.sharding import (
        make_parallel_train_step,
        replicate_global,
        shard_batch_global,
    )
    from deepsc_gan_tpu.train.steps import create_train_state
    from deepsc_gan_tpu.utils.config import Config

    n = N_PROC * LOCAL_DEV
    cfg = Config(vocab_size=64, bs=2 * n, seq_len=12, max_length=11,
                 encoder_num_layer=1, decoder_num_layer=1,
                 encoder_d_model=16, decoder_d_model=16,
                 encoder_d_ff=32, decoder_d_ff=32,
                 encoder_num_heads=2, decoder_num_heads=2,
                 channel_hidden=16, channel_dim=8, channel_dec_hidden=16,
                 dtype="float32")
    mesh = make_mesh(dp=n, snr=1)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    state = state.replace(
        params=replicate_global(jax.device_get(state.params), mesh),
        opt_state=jax.tree.map(
            lambda x: replicate_global(jax.device_get(x), mesh)
            if hasattr(x, "shape") else x, state.opt_state,
            is_leaf=lambda x: hasattr(x, "shape")))

    step = make_parallel_train_step(model, cfg, mesh)
    rng = np.random.default_rng(7)
    batches = rng.integers(0, cfg.vocab_size,
                           size=(steps, cfg.bs, cfg.seq_len)).astype("int32")
    # each process contributes its contiguous slice of the global batch
    pid, npr = jax.process_index(), jax.process_count()
    per = cfg.bs // npr
    losses = []
    for i in range(steps):
        local = batches[i, pid * per : (pid + 1) * per]
        b = shard_batch_global(local, mesh)
        state, loss = step(state, b, b,
                           replicate_global(
                               np.asarray(jax.random.PRNGKey(100 + i)),
                               mesh),
                           replicate_global(np.float32(0.1), mesh))
        losses.append(float(loss))
    return losses


def _losses_pp(steps: int, seed: int = 0):
    """`steps` GPipe pipeline steps over a (pp=2, dp=4) mesh built from
    the GLOBAL device list — under 2 processes the pp axis is exactly the
    process boundary, so every ppermute hop crosses Gloo. Identical
    program in both topologies."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.parallel.pipeline import (
        _pp_spec_rule,
        make_pp_train_step,
        to_pp_params,
    )
    from deepsc_gan_tpu.parallel.sharding import replicate_global
    from deepsc_gan_tpu.train.steps import create_train_state
    from deepsc_gan_tpu.utils.config import Config

    n = N_PROC * LOCAL_DEV
    pp, dp = 2, n // 2
    cfg = Config(vocab_size=64, bs=2 * dp, seq_len=12, max_length=11,
                 encoder_num_layer=2, decoder_num_layer=2,
                 encoder_d_model=16, decoder_d_model=16,
                 encoder_d_ff=32, decoder_d_ff=32,
                 encoder_num_heads=2, decoder_num_heads=2,
                 channel_hidden=16, channel_dim=8, channel_dec_hidden=16,
                 encoder_dropout=0.0, decoder_dropout=0.0,
                 dtype="float32")
    mesh = Mesh(np.array(jax.devices()).reshape(pp, dp), ("pp", "dp"))
    model = make_model(cfg, "transformer")

    # pipeline-layout state placed globally: every process computes the
    # identical init (same seed) and make_array_from_callback hands each
    # device its shard under the pp sharding rule
    base = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    rule = _pp_spec_rule("pp")

    def put(path, leaf):
        x = np.asarray(leaf)
        sh = NamedSharding(mesh, rule(path, leaf))
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx, x=x: x[idx])

    def put_tree(tree):
        return jax.tree_util.tree_map_with_path(put, tree)

    def place_opt(x):
        # param-shaped subtrees (Adam mu/nu) convert to the pp layout and
        # shard like the params; scalar bookkeeping replicates
        if isinstance(x, dict):
            return put_tree(to_pp_params(jax.device_get(x), cfg))
        if hasattr(x, "shape"):
            return replicate_global(np.asarray(x), mesh)
        return x

    state = base.replace(
        step=replicate_global(np.asarray(base.step), mesh),
        params=put_tree(to_pp_params(jax.device_get(base.params), cfg)),
        opt_state=jax.tree.map(place_opt, base.opt_state,
                               is_leaf=lambda x: isinstance(x, dict)))

    step = make_pp_train_step(model, cfg, mesh, n_micro=2)(state)
    rng = np.random.default_rng(7)
    batches = rng.integers(0, cfg.vocab_size,
                           size=(steps, cfg.bs, cfg.seq_len)).astype("int32")
    from jax.sharding import PartitionSpec as P

    data_sh = NamedSharding(mesh, P("dp"))  # batch rows over dp (as the
    # pp step's in_shardings pin them)
    losses = []
    for i in range(steps):
        # batch rows shard over dp WITHIN each process (the pp axis is
        # the process boundary); every process holds the full batch, so
        # the callback hands each device its (row-slice) shard directly
        bi = batches[i]
        b = jax.make_array_from_callback(bi.shape, data_sh,
                                         lambda idx, bi=bi: bi[idx])
        state, loss = step(state, b, b,
                           replicate_global(
                               np.asarray(jax.random.PRNGKey(100 + i)),
                               mesh),
                           replicate_global(np.float32(0.1), mesh))
        losses.append(float(loss))
    return losses


def _losses_tp(steps: int, seed: int = 0):
    """`steps` vocab-tensor-parallel train steps over a (tp=2, dp=4) mesh
    built from the GLOBAL device list — under 2 processes the tp axis is
    exactly the process boundary, so the vocab-parallel CE's pmax/psum
    collectives (parallel/tensor_parallel.py) cross Gloo on every step:
    the last §5.8 path exercised multi-controller. Identical program in
    both topologies."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.parallel.sharding import replicate_global
    from deepsc_gan_tpu.parallel.tensor_parallel import (
        _vocab_param_spec,
        make_tp_train_step,
    )
    from deepsc_gan_tpu.train.steps import create_train_state
    from deepsc_gan_tpu.utils.config import Config

    n = N_PROC * LOCAL_DEV
    tp, dp = 2, n // 2
    cfg = Config(vocab_size=64, bs=2 * dp, seq_len=12, max_length=11,
                 encoder_num_layer=1, decoder_num_layer=1,
                 encoder_d_model=16, decoder_d_model=16,
                 encoder_d_ff=32, decoder_d_ff=32,
                 encoder_num_heads=2, decoder_num_heads=2,
                 channel_hidden=16, channel_dim=8, channel_dec_hidden=16,
                 dtype="float32")
    mesh = Mesh(np.array(jax.devices()).reshape(tp, dp), ("tp", "dp"))
    model = make_model(cfg, "transformer")

    # every process computes the identical init (same seed);
    # make_array_from_callback hands each device its shard under the
    # vocab-sharding rule (the multi-controller shard_tp_state)
    base = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    rule = _vocab_param_spec(cfg, "tp")

    def put(path, leaf):
        x = np.asarray(leaf)
        spec = rule(path, leaf)
        if spec != P() and x.ndim < len(spec):
            spec = P()  # scalar bookkeeping leaf that path-matched
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx, x=x: x[idx])

    state = base.replace(
        step=replicate_global(np.asarray(base.step), mesh),
        params=jax.tree_util.tree_map_with_path(
            put, jax.device_get(base.params)),
        opt_state=jax.tree_util.tree_map_with_path(
            put, jax.device_get(base.opt_state)))

    step = make_tp_train_step(model, cfg, mesh)(base)
    rng = np.random.default_rng(7)
    batches = rng.integers(0, cfg.vocab_size,
                           size=(steps, cfg.bs, cfg.seq_len)).astype("int32")
    data_sh = NamedSharding(mesh, P("dp"))
    losses = []
    for i in range(steps):
        # batch rows shard over dp WITHIN each process (tp is the process
        # boundary); every process holds the full batch, so the callback
        # hands each device its row-slice directly
        bi = batches[i]
        b = jax.make_array_from_callback(bi.shape, data_sh,
                                         lambda idx, bi=bi: bi[idx])
        state, loss = step(state, b, b,
                           replicate_global(
                               np.asarray(jax.random.PRNGKey(100 + i)),
                               mesh),
                           replicate_global(np.float32(0.1), mesh))
        losses.append(float(loss))
    return losses


def worker(pid: int, port: int, steps: int, mode: str) -> None:
    _pin_cpu(LOCAL_DEV)
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEV
    fn = {"dp": _losses, "pp": _losses_pp, "tp": _losses_tp}[mode]
    losses = fn(steps)
    if pid == 0:
        print("MULTI " + " ".join(f"{l:.6f}" for l in losses), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", nargs="?", default="demo",
                    choices=["demo", "worker"])
    ap.add_argument("pid", nargs="?", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--port", type=int, default=29417)
    ap.add_argument("--mode", default="dp", choices=["dp", "pp", "tp"])
    args = ap.parse_args()

    if args.cmd == "worker":
        worker(args.pid, args.port, args.steps, args.mode)
        return

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(pid),
         "--steps", str(args.steps), "--port", str(args.port),
         "--mode", args.mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO) for pid in range(N_PROC)]
    try:
        outs = [p.communicate(timeout=280)[0] for p in procs]
    finally:
        for p in procs:  # never orphan a worker holding the Gloo port
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), outs
    multi = next(l for l in outs[0].splitlines() if l.startswith("MULTI "))
    multi_losses = [float(x) for x in multi.split()[1:]]
    print(f"2-process {args.mode} losses: {multi_losses}")

    # reference: same workload, single process, 8 local devices
    _pin_cpu(N_PROC * LOCAL_DEV)
    single = {"dp": _losses, "pp": _losses_pp,
              "tp": _losses_tp}[args.mode](args.steps)
    print(f"1-process {args.mode} losses: {single}")
    assert all(abs(a - b) < 1e-5 for a, b in zip(multi_losses, single)), (
        multi_losses, single)
    print("OK: multi-controller == single-controller")


if __name__ == "__main__":
    main()
