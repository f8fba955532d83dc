"""Vocab-parallel (tp) training: CE parity with the single-device loss and
full (dp, tp) mesh steps — including the flagship tied+smoothed recipe —
matching the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.parallel.mesh import make_mesh
from deepsc_gan_tpu.parallel.tensor_parallel import (
    make_tp_train_step,
    shard_tp_state,
    vocab_parallel_ce,
)
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step


def _tp_mesh(dp, tp):
    return make_mesh(dp=dp, snr=tp, axis_names=("tp", "dp"))


def test_vocab_parallel_ce_matches_dense():
    """Run vocab_parallel_ce under shard_map on a tp=4 mesh and compare to
    the dense CE — plain and label-smoothed."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    import numpy as onp
    devs = jax.devices()[:4]
    mesh = jax.sharding.Mesh(onp.array(devs).reshape(4), ("tp",))

    n, d, v = 16, 8, 32
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (n, d))
    W = jax.random.normal(jax.random.PRNGKey(1), (d, v)) * 0.4
    b = jax.random.normal(jax.random.PRNGKey(2), (v,)) * 0.1
    labels = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, v)
    mask = jnp.ones((n,), jnp.float32)

    for alpha in (0.0, 0.1):
        def impl(h, W, b, labels, mask):
            off = jax.lax.axis_index("tp") * (v // 4)
            return vocab_parallel_ce(h, W, b, labels, off, "tp", mask,
                                     label_smoothing=alpha, vocab_total=v)

        sharded = jax.jit(shard_map(
            impl, mesh=mesh,
            in_specs=(P(), P(None, "tp"), P("tp"), P(), P()),
            out_specs=P(), check_vma=False))
        got = float(sharded(h, W, b, labels, mask))
        want = float(loss_function(labels[None], (h @ W + b)[None],
                                   label_smoothing=alpha))
        assert np.isclose(got, want, atol=1e-5), alpha


def test_tp_train_step_matches_single_device(tiny_cfg, tiny_batch):
    """The (dp=1, tp=2) step is the SAME program as the single-device step
    at the same global key (GSPMD forward + explicit-collective CE), so
    loss and updated params must agree to reduction-order tolerance."""
    cfg = tiny_cfg.replace(bs=8, vocab_size=40)  # 40 % tp=2 == 0
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_step(model, cfg)
    s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)

    mesh = _tp_mesh(1, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_train_step(model, cfg, mesh)(state)
    s2, l2 = step(state_tp, batch, batch, jax.random.PRNGKey(3), 0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_flagship_recipe_matches_single_device(tiny_cfg, tiny_batch):
    """Round-2 gates lifted: tied embeddings + label smoothing run through
    the (dp=2, tp=2) mesh and match the single-device step at the same
    key (VERDICT r2 item 3)."""
    cfg = tiny_cfg.replace(bs=8, vocab_size=40, tie_embeddings=True,
                           label_smoothing=0.1)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_step(model, cfg)
    s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)

    mesh = _tp_mesh(2, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_train_step(model, cfg, mesh)(state)
    s2, l2 = step(state_tp, batch, batch, jax.random.PRNGKey(3), 0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the tied table (the sharded param) must actually be tp-sharded
    E = s2.params["semantic_decoder"]["embed"]["embedding"]["embedding"]
    assert "tp" in str(E.sharding.spec)


def test_tp_dp_combined(tiny_cfg, tiny_batch):
    """(dp=2, tp=2) mesh runs and loss decreases."""
    cfg = tiny_cfg.replace(bs=8, vocab_size=40)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    mesh = _tp_mesh(2, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_train_step(model, cfg, mesh)(state)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(8):
        key, sub = jax.random.split(key)
        state_tp, loss = step(state_tp, batch, batch, sub, 0.05)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_tp_rejects_indivisible_vocab(tiny_cfg):
    mesh = _tp_mesh(2, 2)
    cfg = tiny_cfg.replace(vocab_size=41)
    with pytest.raises(ValueError, match="vocab"):
        make_tp_train_step(make_model(cfg, "transformer"), cfg, mesh)


def test_tp_step_with_ema_enabled(tiny_cfg, tiny_batch):
    """cfg.ema_decay > 0 must not break the tp step: the EMA shadow rides
    the state pytree through shard_tp_state and the jit shardings."""
    cfg = tiny_cfg.replace(bs=8, vocab_size=40, ema_decay=0.9)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    assert state.ema_params is not None
    mesh = _tp_mesh(1, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_train_step(model, cfg, mesh)(state)
    s2, l2 = step(state_tp, batch, batch, jax.random.PRNGKey(3), 0.1)
    assert np.isfinite(float(l2))
    assert s2.ema_params is not None
    # the shadow moved toward the updated params
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(s2.ema_params),
                        jax.tree.leaves(state.ema_params)))
    assert moved


def test_tp_attack_step_matches_single_device(tiny_cfg, tiny_batch):
    """FGM attack over a (dp=2, tp=2) mesh == the single-device attack
    step at dropout=0 and the same key: losses (clean + adv) and the
    updated params agree to reduction-order tolerance. Covers the
    grad-wrt-y path THROUGH the shard_map CE."""
    from deepsc_gan_tpu.parallel.tensor_parallel import make_tp_attack_step
    from deepsc_gan_tpu.train.steps import make_train_attack_step

    cfg = tiny_cfg.replace(bs=8, vocab_size=40,
                           encoder_dropout=0.0, decoder_dropout=0.0)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_attack_step(model, cfg)
    s1, (c1, a1) = single(state, batch, batch, jax.random.PRNGKey(5),
                          0.0, 0.1, 1.0)

    mesh = _tp_mesh(2, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_attack_step(model, cfg, mesh)(state)
    s2, (c2, a2) = step(state_tp, batch, batch, jax.random.PRNGKey(5),
                        0.0, 0.1, 1.0)
    assert np.isclose(float(c1), float(c2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(a1), float(a2), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_attack_step_adv_weight_and_recipe(tiny_cfg, tiny_batch):
    """adv_weight<1 mixed objective + the flagship tied+smoothed recipe
    run under (dp=1, tp=2) and match the single-device step."""
    from deepsc_gan_tpu.parallel.tensor_parallel import make_tp_attack_step
    from deepsc_gan_tpu.train.steps import make_train_attack_step

    cfg = tiny_cfg.replace(bs=8, vocab_size=40, tie_embeddings=True,
                           label_smoothing=0.1,
                           encoder_dropout=0.0, decoder_dropout=0.0)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_attack_step(model, cfg, adv_weight=0.5)
    s1, (c1, a1) = single(state, batch, batch, jax.random.PRNGKey(7),
                          0.0, 0.1, 1.0)

    mesh = _tp_mesh(1, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_attack_step(model, cfg, mesh, adv_weight=0.5)(state)
    s2, (c2, a2) = step(state_tp, batch, batch, jax.random.PRNGKey(7),
                        0.0, 0.1, 1.0)
    assert np.isclose(float(c1), float(c2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(a1), float(a2), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_gan_step_matches_single_device(tiny_cfg, tiny_batch):
    """GAN 3-phase step over a (dp=2, tp=2) mesh == the single-device
    make_gan_train_step at dropout=0 and the same key: all three losses
    and the updated params agree to reduction-order tolerance. All three
    backward passes cross the vocab-parallel shard_map CE."""
    from deepsc_gan_tpu.parallel.tensor_parallel import make_tp_gan_step
    from deepsc_gan_tpu.train.gan_steps import make_gan_train_step

    cfg = tiny_cfg.replace(bs=8, vocab_size=40,
                           encoder_dropout=0.0, decoder_dropout=0.0)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "gan")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8, traingan=True)

    single = make_gan_train_step(model, cfg)
    s1, (l1, g1, d1) = single(state, batch, batch, jax.random.PRNGKey(9),
                              0.1)

    mesh = _tp_mesh(2, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_gan_step(model, cfg, mesh)(state)
    s2, (l2, g2, d2) = step(state_tp, batch, batch, jax.random.PRNGKey(9),
                            0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(g1), float(g2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(d1), float(d2), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_gan_step_flagship_recipe(tiny_cfg, tiny_batch):
    """Tied embeddings + label smoothing through the tp GAN step
    (dp=1, tp=2) still match the single-device step."""
    from deepsc_gan_tpu.parallel.tensor_parallel import make_tp_gan_step
    from deepsc_gan_tpu.train.gan_steps import make_gan_train_step

    cfg = tiny_cfg.replace(bs=8, vocab_size=40, tie_embeddings=True,
                           label_smoothing=0.1,
                           encoder_dropout=0.0, decoder_dropout=0.0)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "gan")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8, traingan=True)

    single = make_gan_train_step(model, cfg)
    s1, (l1, g1, d1) = single(state, batch, batch, jax.random.PRNGKey(11),
                              0.1)

    mesh = _tp_mesh(1, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_gan_step(model, cfg, mesh)(state)
    s2, (l2, g2, d2) = step(state_tp, batch, batch, jax.random.PRNGKey(11),
                            0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(g1), float(g2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(d1), float(d2), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_mine_step_matches_single_device(tiny_cfg, tiny_batch):
    """MINE joint step over a (dp=2, tp=2) mesh == the single-device
    make_mine_train_step at dropout=0 and the same key: CE, the MI
    estimate (whose marginal permutation crosses dp shards) and both
    updated param trees agree.

    The MINE net compares under SGD, not its default clipped Adam: dead
    ReLU units have true-zero statistics-net gradients that float
    reduction order resolves to 0 or ~1e-10, and Adam's per-coordinate
    normalization amplifies that sign noise to full lr-sized updates —
    SGD keeps updates proportional to gradients, so the equivalence
    claim (same gradients to reduction-order tolerance) is what's
    actually asserted."""
    import optax

    from deepsc_gan_tpu.parallel.sharding import replicate
    from deepsc_gan_tpu.parallel.tensor_parallel import make_tp_mine_step
    from deepsc_gan_tpu.train.mine_steps import (
        MineState,
        create_mine_state,
        make_mine_train_step,
    )

    cfg = tiny_cfg.replace(bs=8, vocab_size=40,
                           encoder_dropout=0.0, decoder_dropout=0.0)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)
    mine, mine_state = create_mine_state(cfg, jax.random.PRNGKey(1),
                                         batch_size=8)
    sgd = optax.sgd(0.1)
    mine_state = MineState(params=mine_state.params,
                           opt_state=sgd.init(mine_state.params), tx=sgd)

    single = make_mine_train_step(model, mine, cfg)
    s1, m1, (c1, mi1) = single(state, mine_state, batch, batch,
                               jax.random.PRNGKey(13), 0.1)

    mesh = _tp_mesh(2, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    mine_tp = replicate(mine_state, mesh)
    step = make_tp_mine_step(model, mine, cfg, mesh)(state)
    s2, m2, (c2, mi2) = step(state_tp, mine_tp, batch, batch,
                             jax.random.PRNGKey(13), 0.1)
    assert np.isclose(float(c1), float(c2), rtol=1e-5, atol=1e-5)
    assert np.isclose(float(mi1), float(mi2), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_star_full_target_matches_single_device(tiny_cfg, tiny_batch):
    """Star variant under (dp=1, tp=2) with full_target=True (the star
    training objective) == the single-device step — the staged tp
    forward covers every transceiver variant, not just the vanilla."""
    cfg = tiny_cfg.replace(bs=8, vocab_size=40)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    single = make_train_step(model, cfg, full_target=True)
    s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)

    mesh = _tp_mesh(1, 2)
    state_tp = shard_tp_state(state, mesh, cfg)
    step = make_tp_train_step(model, cfg, mesh, full_target=True)(state)
    s2, l2 = step(state_tp, batch, batch, jax.random.PRNGKey(3), 0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_train_step_fused_attn_kernel_matches_single(tiny_cfg,
                                                        tiny_batch):
    """The fused Pallas attention under the (dp, tp) mesh: attention
    activations are batch-sharded over dp / replicated over tp, so the
    same set_attn_kernel_mesh shard_map nesting the pure-dp path uses
    applies inside the tp step's GSPMD forward (the vocab-parallel CE is
    untouched). Interpreter mode on the CPU mesh; must match the
    single-device kernel step."""
    from deepsc_gan_tpu.ops.pallas.attention import (
        set_attn_kernel_mesh,
        set_attn_kernel_mode,
    )

    cfg = tiny_cfg.replace(bs=8, vocab_size=40)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    set_attn_kernel_mode("interpret")
    try:
        single = make_train_step(model, cfg)
        s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)

        mesh = _tp_mesh(2, 2)
        set_attn_kernel_mesh(mesh, "dp")
        try:
            state_tp = shard_tp_state(state, mesh, cfg)
            step = make_tp_train_step(model, cfg, mesh)(state)
            s2, l2 = step(state_tp, batch, batch, jax.random.PRNGKey(3),
                          0.1)
        finally:
            set_attn_kernel_mesh(None)
    finally:
        set_attn_kernel_mode("auto")
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_star_step_fused_kernels_match_single(tiny_cfg, tiny_batch):
    """Star variant under the (dp, tp) mesh with BOTH fused Pallas
    kernels nested in shard_maps over the dp axis (the CLI's tp wiring
    registers both meshes): the 5-context satellite kernel and the
    relay/target attention kernel, with the vocab-parallel CE untouched.
    Interpreter mode on the CPU mesh; must match the single-device
    kernel step."""
    from deepsc_gan_tpu.ops.pallas.attention import (
        set_attn_kernel_mesh,
        set_attn_kernel_mode,
    )
    from deepsc_gan_tpu.ops.pallas.star import (
        set_star_kernel_mesh,
        set_star_kernel_mode,
    )

    cfg = tiny_cfg.replace(bs=8, vocab_size=40)
    batch = jnp.concatenate([tiny_batch, tiny_batch], axis=0)
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=8)

    set_attn_kernel_mode("interpret")
    set_star_kernel_mode("interpret")
    try:
        single = make_train_step(model, cfg, full_target=True)
        s1, l1 = single(state, batch, batch, jax.random.PRNGKey(3), 0.1)

        mesh = _tp_mesh(2, 2)
        set_attn_kernel_mesh(mesh, "dp")
        set_star_kernel_mesh(mesh, "dp")
        try:
            state_tp = shard_tp_state(state, mesh, cfg)
            step = make_tp_train_step(model, cfg, mesh,
                                      full_target=True)(state)
            s2, l2 = step(state_tp, batch, batch, jax.random.PRNGKey(3),
                          0.1)
        finally:
            set_attn_kernel_mesh(None)
            set_star_kernel_mesh(None)
    finally:
        set_attn_kernel_mode("auto")
        set_star_kernel_mode("auto")
    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
