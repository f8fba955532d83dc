"""Multi-device sharding on the 8-device virtual CPU mesh: data-parallel
training matches, SNR sweep shards, mesh construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.parallel.mesh import local_mesh, make_mesh
from deepsc_gan_tpu.parallel.sharding import (
    make_parallel_snr_sweep,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, snr=2)
    assert mesh.shape == {"snr": 2, "dp": 4}
    mesh1 = local_mesh(8)
    assert mesh1.shape == {"dp": 8}
    # subset meshes allowed; oversubscription is not
    assert make_mesh(dp=3, snr=2).shape == {"snr": 2, "dp": 3}
    with pytest.raises(ValueError):
        make_mesh(dp=5, snr=2)


def test_dp_train_step_matches_single_device(tiny_cfg, tiny_batch):
    """Same params, same batch, same key: the dp-sharded step must produce
    the same loss and (numerically) the same updated params as the
    single-device step."""
    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_step(model, cfg)
    s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)

    mesh = local_mesh(8)
    par = make_parallel_train_step(model, cfg, mesh)
    state_r = replicate(state, mesh)
    b_sh = shard_batch(batch, mesh)
    s2, l2 = par(state_r, b_sh, b_sh, replicate(jax.random.PRNGKey(3), mesh),
                 replicate(jnp.asarray(0.1), mesh))
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_train_step_loss_decreases(tiny_cfg, tiny_batch):
    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    mesh = local_mesh(8)
    state = replicate(
        create_train_state(model, cfg, jax.random.PRNGKey(0), batch_size=8),
        mesh)
    par = make_parallel_train_step(model, cfg, mesh)
    b_sh = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        key, sub = jax.random.split(key)
        state, loss = par(state, b_sh, b_sh, replicate(sub, mesh),
                          replicate(jnp.asarray(0.05), mesh))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dp_attack_step_matches_single_device(tiny_cfg, tiny_batch):
    """FGM adversarial training scales data-parallel: the GSPMD attack
    step (global-norm FGM included) matches the single-device step."""
    from deepsc_gan_tpu.parallel.sharding import make_parallel_attack_step
    from deepsc_gan_tpu.train.steps import make_train_attack_step

    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_attack_step(model, cfg)
    s1, (c1, a1) = single(state, batch, batch, jax.random.PRNGKey(3),
                          0.0, 0.1, 1.0)

    mesh = local_mesh(8)
    par = make_parallel_attack_step(model, cfg, mesh)
    b_sh = shard_batch(batch, mesh)
    s2, (c2, a2) = par(replicate(state, mesh), b_sh, b_sh,
                       jax.random.PRNGKey(3), 0.0, 0.1, 1.0)
    assert np.isclose(float(c1), float(c2), rtol=1e-5)
    assert np.isclose(float(a1), float(a2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_gan_step_matches_single_device(tiny_cfg, tiny_batch):
    """GAN 3-phase training scales data-parallel: the GSPMD step (shared
    Adam, filtered apply) matches the single-device step."""
    from deepsc_gan_tpu.parallel.sharding import make_parallel_gan_step
    from deepsc_gan_tpu.train.gan_steps import make_gan_train_step

    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "gan")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8, traingan=True)

    single = make_gan_train_step(model, cfg)
    s1, (l1, g1, d1) = single(state, batch, batch, jax.random.PRNGKey(3),
                              0.1)

    mesh = local_mesh(8)
    par = make_parallel_gan_step(model, cfg, mesh)
    b_sh = shard_batch(batch, mesh)
    s2, (l2, g2, d2) = par(replicate(state, mesh), b_sh, b_sh,
                           jax.random.PRNGKey(3), 0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    assert np.isclose(float(g1), float(g2), rtol=1e-5)
    assert np.isclose(float(d1), float(d2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_mine_step_matches_single_device(tiny_cfg, tiny_batch):
    """MINE joint training scales data-parallel: the marginal-sample
    permutation crosses shards, so the global-batch MI matches."""
    from deepsc_gan_tpu.parallel.sharding import make_parallel_mine_step
    from deepsc_gan_tpu.train.mine_steps import (
        create_mine_state,
        make_mine_train_step,
    )

    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    mine, mine_state = create_mine_state(cfg, jax.random.PRNGKey(1),
                                         batch_size=8)

    single = make_mine_train_step(model, mine, cfg)
    s1, m1, (c1, i1) = single(state, mine_state, batch, batch,
                              jax.random.PRNGKey(3), 0.1)

    mesh = local_mesh(8)
    par = make_parallel_mine_step(model, mine, cfg, mesh)
    b_sh = shard_batch(batch, mesh)
    s2, m2, (c2, i2) = par(replicate(state, mesh),
                           replicate(mine_state, mesh), b_sh, b_sh,
                           jax.random.PRNGKey(3), 0.1)
    assert np.isclose(float(c1), float(c2), rtol=1e-5)
    assert np.isclose(float(i1), float(i2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_snr_sweep_sharded(tiny_cfg, tiny_batch):
    """8 SNR points evaluated in one call, sharded over the snr axis."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=8)
    sweep = make_parallel_snr_sweep(model, cfg, mesh)
    n_stds = jnp.asarray([1.0, 0.7, 0.5, 0.35, 0.25, 0.18, 0.12, 0.08])
    params = replicate(state.params, mesh)
    ce, acc = sweep(params, replicate(tiny_batch, mesh),
                    replicate(tiny_batch, mesh),
                    replicate(jax.random.PRNGKey(1), mesh),
                    jax.device_put(
                        n_stds,
                        jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec("snr"))))
    assert ce.shape == (8,) and acc.shape == (8,)
    assert np.all(np.isfinite(np.asarray(ce)))


def test_greedy_sweep_sharded_matches_vmapped(tiny_cfg, tiny_batch):
    """Mesh-sharded greedy sweep produces the same tokens as the
    single-device vmapped sweep."""
    from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
    from deepsc_gan_tpu.parallel.sharding import make_parallel_greedy_sweep

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=8)
    par = make_parallel_greedy_sweep(model, cfg, mesh)
    ref_sweep = make_greedy_decode_sweep(model, cfg)
    n_stds = jnp.asarray([1.0, 0.7, 0.5, 0.35, 0.25, 0.18, 0.12, 0.08])
    key = jax.random.PRNGKey(4)

    want = np.asarray(ref_sweep(state.params, tiny_batch, key, 0.0, n_stds))
    got = np.asarray(par(
        replicate(state.params, mesh), replicate(tiny_batch, mesh),
        replicate(key, mesh),
        replicate(jnp.asarray(0.0), mesh),
        jax.device_put(n_stds, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("snr")))))
    np.testing.assert_array_equal(got, want)


def test_beam_sweep_sharded_matches_vmapped(tiny_cfg, tiny_batch):
    """Mesh-sharded KV beam sweep (shard_map over the snr axis) produces
    the same best-beam tokens as the single-device vmapped sweep."""
    from deepsc_gan_tpu.evaluate.beam import make_beam_decode_sweep
    from deepsc_gan_tpu.parallel.sharding import make_parallel_beam_sweep

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=4)
    par = make_parallel_beam_sweep(model, cfg, mesh, beam_size=3)
    ref_sweep = make_beam_decode_sweep(model, cfg, beam_size=3)
    n_stds = jnp.asarray([1.0, 0.5, 0.25, 0.1])
    key = jax.random.PRNGKey(6)

    want = np.asarray(ref_sweep(state.params, tiny_batch, key, 0.0, n_stds))
    got = np.asarray(par(state.params, tiny_batch, key,
                         jnp.asarray(0.0), n_stds))
    np.testing.assert_array_equal(got, want)


def test_greedy_kv_sweep_sharded_matches_vmapped(tiny_cfg, tiny_batch):
    """Mesh-sharded KV greedy sweep (shard_map over the snr axis) matches
    the single-device vmapped KV sweep token-for-token."""
    from deepsc_gan_tpu.evaluate.kv_decode import make_greedy_decode_kv_sweep
    from deepsc_gan_tpu.parallel.sharding import make_parallel_greedy_kv_sweep

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=4)
    par = make_parallel_greedy_kv_sweep(model, cfg, mesh)
    ref_sweep = make_greedy_decode_kv_sweep(model, cfg)
    n_stds = jnp.asarray([1.0, 0.5, 0.25, 0.1])
    key = jax.random.PRNGKey(8)

    want = np.asarray(ref_sweep(state.params, tiny_batch, key, 0.0, n_stds))
    got = np.asarray(par(state.params, tiny_batch, key,
                         jnp.asarray(0.0), n_stds))
    np.testing.assert_array_equal(got, want)


def test_dp_train_step_fused_attn_kernel_matches_single(tiny_cfg, tiny_batch):
    """Pure-dp mesh paths keep the fused Pallas attention: with
    set_attn_kernel_mesh registered (the CLI's pure-dp wiring), the
    kernel call nests a shard_map over the dp axis inside the GSPMD dp
    step. Run under the Pallas interpreter on the CPU mesh; loss and
    updated params must match the single-device kernel step."""
    from deepsc_gan_tpu.ops.pallas.attention import (
        set_attn_kernel_mesh,
        set_attn_kernel_mode,
    )

    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    mesh = local_mesh(8)

    set_attn_kernel_mode("interpret")
    try:
        single = make_train_step(model, cfg)
        s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)
        set_attn_kernel_mesh(mesh, "dp")
        try:
            par = make_parallel_train_step(model, cfg, mesh)
            b_sh = shard_batch(batch, mesh)
            s2, l2 = par(replicate(state, mesh), b_sh, b_sh,
                         replicate(jax.random.PRNGKey(3), mesh),
                         replicate(jnp.asarray(0.1), mesh))
        finally:
            set_attn_kernel_mesh(None)
    finally:
        set_attn_kernel_mode("auto")
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_attack_step_fused_attn_kernel_matches_single(tiny_cfg,
                                                         tiny_batch):
    """FGM adversarial dp step with the fused attention kernel sharded
    over the dp axis: the grad-wrt-intermediate FGM motif differentiates
    through the nested shard_map (kernel custom VJP included) and
    matches the single-device kernel step."""
    from deepsc_gan_tpu.ops.pallas.attention import (
        set_attn_kernel_mesh,
        set_attn_kernel_mode,
    )
    from deepsc_gan_tpu.parallel.sharding import make_parallel_attack_step
    from deepsc_gan_tpu.train.steps import make_train_attack_step

    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    mesh = local_mesh(8)

    set_attn_kernel_mode("interpret")
    try:
        single = make_train_attack_step(model, cfg)
        s1, (c1, a1) = single(state, batch, batch, jax.random.PRNGKey(3),
                              0.0, 0.1, 1.0)
        set_attn_kernel_mesh(mesh, "dp")
        try:
            par = make_parallel_attack_step(model, cfg, mesh)
            b_sh = shard_batch(batch, mesh)
            s2, (c2, a2) = par(replicate(state, mesh), b_sh, b_sh,
                               jax.random.PRNGKey(3), 0.0, 0.1, 1.0)
        finally:
            set_attn_kernel_mesh(None)
    finally:
        set_attn_kernel_mode("auto")
    assert np.isclose(float(c1), float(c2), rtol=1e-5)
    assert np.isclose(float(a1), float(a2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_star_step_fused_kernels_match_single(tiny_cfg, tiny_batch):
    """Star variant under dp with BOTH fused Pallas kernels sharded over
    the dp axis (the CLI's pure-dp wiring registers both meshes): the
    satellite 5-context kernel via set_star_kernel_mesh and the relay /
    target attention via set_attn_kernel_mesh. Interpreter mode on the
    CPU mesh; loss and updated params must match the single-device
    kernel step."""
    from deepsc_gan_tpu.ops.pallas.attention import (
        set_attn_kernel_mesh,
        set_attn_kernel_mode,
    )
    from deepsc_gan_tpu.ops.pallas.star import (
        set_star_kernel_mesh,
        set_star_kernel_mode,
    )

    cfg = tiny_cfg.replace(bs=8)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    mesh = local_mesh(8)

    set_attn_kernel_mode("interpret")
    set_star_kernel_mode("interpret")
    try:
        single = make_train_step(model, cfg, full_target=True)
        s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)
        set_attn_kernel_mesh(mesh, "dp")
        set_star_kernel_mesh(mesh, "dp")
        try:
            par = make_parallel_train_step(model, cfg, mesh,
                                           full_target=True)
            b_sh = shard_batch(batch, mesh)
            s2, l2 = par(replicate(state, mesh), b_sh, b_sh,
                         replicate(jax.random.PRNGKey(3), mesh),
                         replicate(jnp.asarray(0.1), mesh))
        finally:
            set_attn_kernel_mesh(None)
            set_star_kernel_mesh(None)
    finally:
        set_attn_kernel_mode("auto")
        set_star_kernel_mode("auto")
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_greedy_sweep_sharded_fused_attn_matches_vmapped(tiny_cfg,
                                                         tiny_batch):
    """The snr-sharded greedy sweep with the fused Pallas attention
    traced inside each device's shard (the sweeps are explicit
    shard_maps, so the vmapped kernel batches by growing its grid — no
    GSPMD partitioning of the custom call) produces the same tokens as
    the single-device vmapped sweep under the same kernel mode."""
    from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode
    from deepsc_gan_tpu.parallel.sharding import make_parallel_greedy_sweep

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=8)
    n_stds = jnp.asarray([1.0, 0.7, 0.5, 0.35, 0.25, 0.18, 0.12, 0.08])
    key = jax.random.PRNGKey(4)

    set_attn_kernel_mode("interpret")
    try:
        ref_sweep = make_greedy_decode_sweep(model, cfg)
        want = np.asarray(ref_sweep(state.params, tiny_batch, key, 0.0,
                                    n_stds))
        par = make_parallel_greedy_sweep(model, cfg, mesh)
        got = np.asarray(par(state.params, tiny_batch, key,
                             jnp.asarray(0.0), n_stds))
    finally:
        set_attn_kernel_mode("auto")
    np.testing.assert_array_equal(got, want)


def test_snr_sweep_sharded_fused_attn_matches_vmapped(tiny_cfg, tiny_batch):
    """Teacher-forced CE/acc snr-sharded sweep with the fused Pallas
    attention inside each shard matches the single-device vmapped values
    under the same kernel mode (keys split over the GLOBAL S axis)."""
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=8)
    n_stds = jnp.asarray([1.0, 0.7, 0.5, 0.35, 0.25, 0.18, 0.12, 0.08])
    key = jax.random.PRNGKey(4)

    set_attn_kernel_mode("interpret")
    try:
        sweep = make_parallel_snr_sweep(model, cfg, mesh)
        ce_sh, acc_sh = sweep(state.params, tiny_batch, tiny_batch, key,
                              n_stds)

        # single-device reference: same vmapped body, no mesh
        from deepsc_gan_tpu.parallel.mesh import make_mesh as _mm
        mesh1 = _mm(dp=1, snr=1)
        one = make_parallel_snr_sweep(model, cfg, mesh1)
        ce_1, acc_1 = one(state.params, tiny_batch, tiny_batch, key, n_stds)
    finally:
        set_attn_kernel_mode("auto")
    np.testing.assert_allclose(np.asarray(ce_sh), np.asarray(ce_1),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_1),
                               rtol=1e-5)


def test_star_greedy_sweep_sharded_fused_kernels_matches_vmapped(
        tiny_cfg, tiny_batch):
    """Star one-shot decode sharded over the snr axis with BOTH fused
    Pallas kernels (satellite + attention) traced inside each device's
    shard matches the single-device vmapped sweep under the same kernel
    mode — the `cli evaluate --variant star --snr-parallel N` path."""
    from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode
    from deepsc_gan_tpu.ops.pallas.star import set_star_kernel_mode
    from deepsc_gan_tpu.parallel.sharding import make_parallel_greedy_sweep

    cfg = tiny_cfg
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mesh = make_mesh(dp=1, snr=8)
    n_stds = jnp.asarray([1.0, 0.7, 0.5, 0.35, 0.25, 0.18, 0.12, 0.08])
    key = jax.random.PRNGKey(4)

    set_attn_kernel_mode("interpret")
    set_star_kernel_mode("interpret")
    try:
        ref_sweep = make_greedy_decode_sweep(model, cfg,
                                             position_mode="oneshot")
        want = np.asarray(ref_sweep(state.params, tiny_batch, key, 0.0,
                                    n_stds))
        par = make_parallel_greedy_sweep(model, cfg, mesh,
                                         position_mode="oneshot")
        got = np.asarray(par(state.params, tiny_batch, key,
                             jnp.asarray(0.0), n_stds))
    finally:
        set_attn_kernel_mode("auto")
        set_star_kernel_mode("auto")
    np.testing.assert_array_equal(got, want)
