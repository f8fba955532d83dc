"""Sharded training and evaluation over the device mesh.

Data-parallel training: params/opt-state replicated, batch sharded on the
`dp` axis. The train step is jitted with explicit `NamedSharding`s; XLA
inserts the gradient all-reduce (psum over ICI) automatically from the
sharding constraints — no hand-written collectives needed at this model
scale (the "let XLA insert collectives" recipe).

SNR-sweep evaluation: the BLEU-vs-SNR curve is embarrassingly parallel
across SNR points. `make_parallel_snr_sweep` vmaps teacher-forced eval
over a vector of noise levels and shards that axis over the mesh's `snr`
axis, so a v5e-8 evaluates 8 SNR points per step instead of 1 — this is
the capability BASELINE.json names ("SNR-sweep BLEU evaluation batched
across chips").
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.steps import (
    TrainState,
    _loss_kwargs,
    _shift_targets,
    _step_noise,
)
from deepsc_gan_tpu.utils.config import Config


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host array with its leading dim sharded over `axis`."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis)))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch_global(local_batch, mesh: Mesh, axis: str = "dp"):
    """Multi-host variant of shard_batch: each process passes its LOCAL
    slice of the batch (global batch = concatenation over process index);
    returns a global array sharded over `axis`. device_put cannot place
    shards on non-addressable devices, so multi-controller runs go through
    jax.make_array_from_process_local_data. Works single-process too."""
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), local_batch, global_shape)


def replicate_global(tree, mesh: Mesh):
    """Multi-host variant of replicate: every process passes an IDENTICAL
    host pytree (e.g. params from the same PRNG seed) and gets back
    globally-replicated arrays."""
    import numpy as np

    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), np.shape(x)),
        tree)


def make_parallel_train_step(model, cfg: Config, mesh: Mesh,
                             channel_kind: Optional[str] = None,
                             full_target: bool = False,
                             dp_axis: str = "dp") -> Callable:
    """Data-parallel version of train.steps.make_train_step. Returns
    `step(state, inp, tar, key, n_std) -> (state, loss)` with batch inputs
    sharded over `dp_axis` and state replicated. The PRNG key is GLOBAL
    (GSPMD semantics): the same program as the single-device step, with
    the batch axis sharded — so the dp step is bit-equivalent to the
    single-device step on the gathered batch (tested in
    tests/test_sharding.py), and noise realizations differ across the
    batch (not per-device) exactly as they do unsharded."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    from deepsc_gan_tpu.train.steps import make_forward_loss
    forward_loss = make_forward_loss(model, cfg, kind, lkw)

    ndp = mesh.shape[dp_axis]
    if cfg.bs % ndp:
        raise ValueError(
            f"batch size {cfg.bs} not divisible by dp={ndp}")

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(dp_axis))

    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        if full_target:
            tar_real = tar
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # same 3-way split + per-step SNR draw as make_train_step, so the
        # dp step stays bit-equivalent to the single-device step for ALL
        # configs, including train_snr_random (the key is global/replicated)
        k_ch, k_do, k_snr = jax.random.split(key, 3)
        n_std_t = _step_noise(cfg, k_snr, n_std)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)

        def loss_fn(params):
            return forward_loss(params, inp, tar_inp, tar_real, k_ch, k_do,
                                p, 0.0, n_std_t, enc_mask, combined_mask,
                                dec_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(
        step,
        in_shardings=(repl, data, data, repl, repl),
        out_shardings=(repl, repl),
    )


def _gspmd(step, arg_shardings, out_shardings):
    """Jit a RAW (un-jitted) single-device step function with explicit
    shardings — the step makers hand it out via their `jit=False` mode.

    GSPMD semantics: the SAME traced program as the single-device step,
    with input shardings constraining the layout — XLA partitions the
    computation and inserts the collectives (gradient psum, global-norm
    reductions for FGM, batch-permutation all-to-all for MINE) over ICI.
    The result is bit-equivalent to the single-device step on the gathered
    batch (tested in tests/test_sharding.py)."""
    return jax.jit(step, in_shardings=arg_shardings,
                   out_shardings=out_shardings)


def make_parallel_attack_step(model, cfg: Config, mesh: Mesh,
                              channel_kind: Optional[str] = None,
                              full_target: bool = False,
                              adv_weight: float = 1.0,
                              dp_axis: str = "dp") -> Callable:
    """Data-parallel FGM adversarial train step (the reference's core
    `train_attack_step` loop, utlis/trainer.py:30-64, scaled over the
    mesh). Same program as train.steps.make_train_attack_step with the
    batch sharded over `dp_axis`: the per-sample FGM norms are local rows;
    the trailing GLOBAL norm (quirk Q7) and the loss/grad means become XLA
    cross-chip reductions. Returns
    `step(state, inp, tar, key, pnr_db, n_std, epsilon)
    -> (state, (clean_loss, adv_loss))` with state replicated."""
    from deepsc_gan_tpu.train.steps import make_train_attack_step

    step = make_train_attack_step(model, cfg, channel_kind, full_target,
                                  adv_weight, jit=False)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(dp_axis))
    return _gspmd(step, (repl, data, data, repl, repl, repl, repl), repl)


def make_parallel_gan_step(model, cfg: Config, mesh: Mesh,
                           channel_kind: Optional[str] = None,
                           dp_axis: str = "dp",
                           full_target: bool = False) -> Callable:
    """Data-parallel GAN 3-phase train step (reference `gan_train_step`,
    utlis/gan_train.py:8-50, scaled over the mesh). Same program as
    train.gan_steps.make_gan_train_step — shared-Adam filtered-apply
    semantics included — with the batch sharded over `dp_axis`; the three
    backward passes each psum their grads across chips. Returns
    `step(state, inp, tar, key, n_std)
    -> (state, (loss, g_loss, d_loss))` with state replicated."""
    from deepsc_gan_tpu.train.gan_steps import make_gan_train_step

    step = make_gan_train_step(model, cfg, channel_kind, jit=False,
                               full_target=full_target)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(dp_axis))
    return _gspmd(step, (repl, data, data, repl, repl), repl)


def make_parallel_mine_step(model, mine, cfg: Config, mesh: Mesh,
                            channel_kind: Optional[str] = None,
                            dp_axis: str = "dp") -> Callable:
    """Data-parallel MINE joint train step (quirk Q6 capability,
    train.mine_steps). The batch (and hence the tx/y samples feeding the
    DV bound) is sharded over `dp_axis`; the marginal-sample permutation
    crosses shards (XLA inserts the all-to-all), so the MI estimate is
    computed over the GLOBAL batch exactly as on one device. Returns
    `step(state, mine_state, inp, tar, key, n_std)
    -> (state, mine_state, (loss, mi))` with both states replicated."""
    from deepsc_gan_tpu.train.mine_steps import make_mine_train_step

    step = make_mine_train_step(model, mine, cfg, channel_kind, jit=False)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(dp_axis))
    return _gspmd(step, (repl, repl, data, data, repl, repl), repl)


def make_parallel_greedy_sweep(model, cfg: Config, mesh: Mesh,
                               channel_kind: Optional[str] = None,
                               position_mode: str = "step",
                               snr_axis: str = "snr") -> Callable:
    """Greedy decode across a VECTOR of noise levels with the S axis
    sharded over the mesh's snr axis — each device (group) decodes its own
    SNR points of the BLEU-vs-SNR curve. Returns
    `sweep(params, inp, key, pnr_db, n_stds[S]) -> (S, B, T+1) ids` with
    params/inputs replicated and S sharded. S must be divisible by the
    snr-axis size.

    Explicit `shard_map` (not jit + in_shardings): SNR points are
    embarrassingly parallel, and running the whole vmapped decode
    per-device lets the fused Pallas attention / star-satellite kernels
    trace inside the shard (a `pallas_call` batches under vmap by
    growing its grid, but GSPMD cannot partition the resulting Mosaic
    custom call over the snr axis — the round-4 reason this sweep forced
    the XLA einsum path). The key is split over the GLOBAL S axis before
    sharding, so tokens match the unsharded
    evaluate.greedy.make_greedy_decode_sweep exactly (tests/
    test_sharding.py::test_greedy_sweep_sharded_matches_vmapped)."""
    from jax import shard_map

    from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode

    decode = make_greedy_decode(model, cfg, channel_kind, position_mode,
                                jit=False)

    def local_sweep(params, inp, keys, pnr_db, n_stds):
        return jax.vmap(decode, in_axes=(None, None, 0, None, 0))(
            params, inp, keys, pnr_db, n_stds)

    mapped = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(), P(), P(snr_axis), P(), P(snr_axis)),
        out_specs=P(snr_axis),
        check_vma=False)

    @jax.jit
    def sweep(params, inp, key, pnr_db, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return mapped(params, inp, keys, pnr_db, n_stds)

    return sweep


def make_parallel_greedy_kv_sweep(model, cfg: Config, mesh: Mesh,
                                  channel_kind: Optional[str] = None,
                                  snr_axis: str = "snr") -> Callable:
    """KV-cached greedy decode across a VECTOR of noise levels with the S
    axis sharded over the mesh's snr axis — the serving-path counterpart
    of make_parallel_greedy_sweep (which shards the full-prefix decoder
    via GSPMD). Explicit shard_map: each device decodes its local SNR
    shard whole; keys split over the GLOBAL S axis, so tokens match the
    unsharded evaluate.kv_decode.make_greedy_decode_kv_sweep exactly."""
    from jax import shard_map

    from deepsc_gan_tpu.evaluate.kv_decode import make_greedy_decode_kv

    decode = make_greedy_decode_kv(model, cfg, channel_kind, jit=False)

    def local_sweep(params, inp, keys, pnr_db, n_stds):
        return jax.vmap(decode, in_axes=(None, None, 0, None, 0))(
            params, inp, keys, pnr_db, n_stds)

    mapped = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(), P(), P(snr_axis), P(), P(snr_axis)),
        out_specs=P(snr_axis),
        check_vma=False)

    @jax.jit
    def sweep(params, inp, key, pnr_db, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return mapped(params, inp, keys, pnr_db, n_stds)

    return sweep


def make_parallel_beam_sweep(model, cfg: Config, mesh: Mesh,
                             beam_size: int = 4,
                             channel_kind: Optional[str] = None,
                             snr_axis: str = "snr") -> Callable:
    """KV-cached beam search across a VECTOR of noise levels with the S
    axis sharded over the mesh's snr axis (the beam counterpart of
    make_parallel_greedy_sweep). Returns
    `sweep(params, inp, key, pnr_db, n_stds[S]) -> (S, B, T+1) ids`
    (best beam per sequence); S must be divisible by the snr-axis size.

    Unlike the greedy sweep (plain jit + in_shardings, GSPMD partitions
    the program), this one is an explicit `shard_map`: the beam step's
    fused candidate scorer is a `pallas_call` (ops/pallas/topk.py), which
    GSPMD cannot partition — shard_map runs the whole kernel per device
    on its local SNR shard instead, which is also the right layout (SNR
    points are embarrassingly parallel; no collectives). The key is split
    over the GLOBAL S axis before sharding, so each SNR point sees the
    same noise realization as the unsharded
    evaluate.beam.make_beam_decode_sweep (token parity tested)."""
    from jax import shard_map

    from deepsc_gan_tpu.evaluate.beam import make_beam_decode_kv

    decode = make_beam_decode_kv(model, cfg, beam_size,
                                 channel_kind, jit=False)

    def local_sweep(params, inp, keys, pnr_db, n_stds):
        return jax.vmap(decode, in_axes=(None, None, 0, None, 0))(
            params, inp, keys, pnr_db, n_stds)

    mapped = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(), P(), P(snr_axis), P(), P(snr_axis)),
        out_specs=P(snr_axis),
        check_vma=False)

    @jax.jit
    def sweep(params, inp, key, pnr_db, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return mapped(params, inp, keys, pnr_db, n_stds)

    return sweep


def make_parallel_snr_sweep(model, cfg: Config, mesh: Mesh,
                            channel_kind: Optional[str] = None,
                            full_target: bool = False,
                            snr_axis: str = "snr") -> Callable:
    """Teacher-forced CE + token-accuracy across a VECTOR of SNR points in
    one device-parallel call. Returns
    `sweep(params, inp, tar, key, n_stds) -> (ce[S], acc[S])` with the S
    axis sharded over the mesh's snr axis. (Greedy-decode BLEU sweeps use
    the same pattern through evaluate.evaluator on each shard.)

    Explicit `shard_map` over the snr axis for the same reason as
    make_parallel_greedy_sweep: the per-device body keeps the fused
    Pallas kernels (GSPMD cannot partition a vmapped Mosaic custom
    call). Keys are split over the GLOBAL S axis, so values match the
    single-device vmapped sweep exactly."""
    from jax import shard_map

    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)

    def one_point(params, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        if full_target:
            tar_real = tar
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        logits, *_ = model.apply(
            {"params": params}, inp, tar_inp, key,
            jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32),
            0.0, kind, n_std, enc_mask, combined_mask, dec_mask,
            deterministic=True)
        ce = loss_function(tar_real, logits, **lkw)
        pred = jnp.argmax(logits, axis=-1)
        mask = (tar_real != cfg.pad_idx).astype(jnp.float32)
        acc = jnp.sum((pred == tar_real) * mask) / jnp.maximum(
            jnp.sum(mask), 1.0)
        return ce, acc

    def local_sweep(params, inp, tar, keys, n_stds):
        return jax.vmap(one_point, in_axes=(None, None, None, 0, 0))(
            params, inp, tar, keys, n_stds)

    mapped = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(), P(), P(), P(snr_axis), P(snr_axis)),
        out_specs=(P(snr_axis), P(snr_axis)),
        check_vma=False)

    @jax.jit
    def sweep(params, inp, tar, key, n_stds):
        keys = jax.random.split(key, n_stds.shape[0])
        return mapped(params, inp, tar, keys, n_stds)

    return sweep
