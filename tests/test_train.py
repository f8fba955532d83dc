"""Training steps: loss decreases on a tiny task; attack/MINE steps run;
determinism at fixed keys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.mine_steps import create_mine_state, make_mine_train_step
from deepsc_gan_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_attack_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def trained(tiny_cfg, tiny_batch):
    """Train the vanilla transceiver a few dozen steps on one batch."""
    cfg = tiny_cfg.replace(lr=2e-3)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(80):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.02)
        losses.append(float(loss))
    return model, state, losses


def test_loss_decreases(trained):
    _, _, losses = trained
    assert losses[-1] < losses[0] * 0.7, losses[::8]


def test_train_step_deterministic(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    key = jax.random.PRNGKey(0)
    s1 = create_train_state(model, cfg, key, batch_size=cfg.bs)
    s2 = create_train_state(model, cfg, key, batch_size=cfg.bs)
    step = make_train_step(model, cfg)
    s1, l1 = step(s1, tiny_batch, tiny_batch, jax.random.PRNGKey(5), 0.1)
    s2, l2 = step(s2, tiny_batch, tiny_batch, jax.random.PRNGKey(5), 0.1)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attack_step_runs_and_reports_both_losses(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    astep = make_train_attack_step(model, cfg)
    state, (clean, adv) = astep(state, tiny_batch, tiny_batch,
                                jax.random.PRNGKey(1), 10.0, 0.1, 1.0)
    assert np.isfinite(float(clean)) and np.isfinite(float(adv))


def test_eval_step_attack_hurts(trained, tiny_cfg, tiny_batch):
    """After training, the FGM-attacked loss should exceed the clean loss
    at high PNR."""
    model, state, _ = trained
    ev = make_eval_step(model, tiny_cfg)
    clean, attacked, _, _ = ev(state, tiny_batch, tiny_batch,
                               jax.random.PRNGKey(2), 20.0, 0.02, 1.0)
    assert float(attacked) > float(clean)


def test_mine_estimates_positive_mi(tiny_cfg):
    """MINE on strongly correlated (x, y=x+small noise) should find
    clearly positive MI (true MI ~18 nats; the DV bound is noisy, so
    average the tail)."""
    import optax
    from deepsc_gan_tpu.models.mine import MINE, mine_loss

    mine = MINE(hidden=64)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((64, 4, 2))
    params = mine.init(key, x0, x0)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        kx, kn, kp = jax.random.split(key, 3)
        x = jax.random.normal(kx, (64, 4, 2))
        y = x + 0.1 * jax.random.normal(kn, x.shape)
        (loss, mi), g = jax.value_and_grad(
            lambda p: mine_loss({"params": p}, mine, kp, x, y),
            has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, mi

    mis = []
    for i in range(600):
        key, sub = jax.random.split(key)
        params, opt, mi = step(params, opt, sub)
        mis.append(float(mi))
    assert np.mean(mis[-50:]) > 1.0, np.mean(mis[-50:])


def test_mine_joint_step_runs(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mine, mstate = create_mine_state(cfg, jax.random.PRNGKey(1),
                                     batch_size=cfg.bs)
    step = make_mine_train_step(model, mine, cfg)
    state, mstate, (ce, mi) = step(state, mstate, tiny_batch, tiny_batch,
                                   jax.random.PRNGKey(2), 0.1)
    assert np.isfinite(float(ce)) and np.isfinite(float(mi))


def test_eval_step_fading_uses_awgn_gradient(tiny_cfg, tiny_batch):
    """Non-AWGN eval: the FGM gradient is taken through an AWGN pass
    (reference eval.py:204-213) — step must run and return finite losses
    for Rayleigh and Rician."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    for kind in ("Rayleigh", "Rician"):
        ev = make_eval_step(model, cfg, channel_kind=kind)
        cl, al, _, _ = ev(state, tiny_batch, tiny_batch,
                          jax.random.PRNGKey(1), 5.0, 0.3, 1.0)
        assert np.isfinite(float(cl)) and np.isfinite(float(al)), kind


def test_train_step_fading_channels(tiny_cfg, tiny_batch):
    """Training through the fading channels: grads flow, loss finite."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    for kind in ("Rayleigh", "Rician"):
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   batch_size=cfg.bs)
        step = make_train_step(model, cfg, channel_kind=kind)
        state, loss = step(state, tiny_batch, tiny_batch,
                           jax.random.PRNGKey(1), 0.3)
        assert np.isfinite(float(loss)), kind


def test_ema_params_track_and_scan(tiny_cfg, tiny_batch):
    """cfg.ema_decay > 0: TrainState carries an EMA shadow updated as
    d*ema + (1-d)*params each step — including through the multi-step
    scan — and eval_params() selects it."""
    import numpy as np

    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        eval_params,
        make_train_multi_step,
        make_train_step,
    )

    cfg = tiny_cfg.replace(ema_decay=0.5, lr=2e-3)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=tiny_cfg.bs)
    assert state.ema_params is not None
    step = make_train_step(model, cfg)
    s1, _ = step(state, tiny_batch, tiny_batch, jax.random.PRNGKey(1), 0.1)
    # manual EMA from (initial params, updated params)
    want = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p,
                        state.params, s1.params)
    got = eval_params(s1)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # EMA lags behind the live params (differs after an update)
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree.leaves(s1.params), jax.tree.leaves(got))]
    assert max(diffs) > 0

    # multi-step scan carries and updates the shadow (K sequential steps
    # == K single steps, EMA included)
    multi = make_train_multi_step(model, cfg, donate=False)
    batch2 = jnp.stack([tiny_batch, tiny_batch], axis=0)
    sm, _ = multi(state, batch2, batch2, jax.random.PRNGKey(1), 0.1)
    assert sm.ema_params is not None
    assert int(sm.step) == 2

    # ema_decay=0 keeps the old behavior: no shadow
    cfg0 = tiny_cfg
    s0 = create_train_state(make_model(cfg0, "transformer"), cfg0,
                            jax.random.PRNGKey(0), batch_size=tiny_cfg.bs)
    assert s0.ema_params is None
    assert eval_params(s0) is s0.params


def test_remat_step_matches_exact(tiny_cfg, tiny_batch):
    """Config.remat recomputes layer activations in the backward — the
    update must be bit-equal to the standard step (same program semantics,
    jax.checkpoint only changes scheduling)."""
    import numpy as np

    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import create_train_state, make_train_step

    m1 = make_model(tiny_cfg, "transformer")
    s1 = create_train_state(m1, tiny_cfg, jax.random.PRNGKey(0))
    cfg2 = tiny_cfg.replace(remat=True)
    m2 = make_model(cfg2, "transformer")
    s2 = create_train_state(m2, cfg2, jax.random.PRNGKey(0))
    st1, l1 = make_train_step(m1, tiny_cfg)(s1, tiny_batch, tiny_batch,
                                            jax.random.PRNGKey(3), 0.1)
    st2, l2 = make_train_step(m2, cfg2)(s2, tiny_batch, tiny_batch,
                                        jax.random.PRNGKey(3), 0.1)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rbg_rng_impl_trains(tiny_cfg, tiny_batch):
    """Config.rng_impl="rbg" (the profiled production RNG at scale) flows
    through key creation, dropout and channel noise; loss decreases."""
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_step_key,
        make_train_step,
    )

    cfg = tiny_cfg.replace(rng_impl="rbg")
    key = make_step_key(cfg, 0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, key)
    step = make_train_step(model, cfg)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.05)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
