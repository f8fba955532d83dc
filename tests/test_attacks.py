"""Attack utilities: FGM normalization properties, PGD bisection, and the
grad-w.r.t.-intermediate pattern end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.attacks import (
    fgm_normalize,
    fgm_perturbation,
    pgd_bisection,
)
from deepsc_gan_tpu.train.steps import create_train_state


def test_fgm_normalize_unit_norm():
    g = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 3)) * 7.0
    r = fgm_normalize(g)
    assert np.isclose(float(jnp.linalg.norm(r)), 1.0, atol=1e-5)
    # per-sample pre-normalization: all samples carry equal power
    per = np.linalg.norm(np.asarray(r).reshape(4, -1), axis=1)
    np.testing.assert_allclose(per, per[0] * np.ones(4), rtol=1e-5)


def test_fgm_normalize_direction_preserved():
    g = jnp.zeros((2, 2, 2)).at[0, 0, 0].set(5.0).at[1, 1, 1].set(-3.0)
    r = np.asarray(fgm_normalize(g))
    assert r[0, 0, 0] > 0 and r[1, 1, 1] < 0
    assert r[0, 1, 1] == 0


def test_fgm_perturbation_increases_loss():
    """For a smooth loss, stepping along the normalized gradient must not
    decrease it (locally)."""

    def loss(y):
        return jnp.sum((y - 2.0) ** 2)

    y = jnp.ones((2, 3, 4))
    r, l0 = fgm_perturbation(loss, y)
    l1 = loss(y + 0.1 * r)
    assert float(l1) > float(l0)


def test_pgd_bisection_converges():
    """Quadratic loss along the direction: bisection should find an eps
    with attacked loss >= clean loss, inside [0, 1]."""

    direction = jnp.ones((1, 2, 2))

    def loss_of_p(p):
        return jnp.sum(p**2) * 10.0

    clean = jnp.asarray(0.5)
    eps, loss_m = pgd_bisection(loss_of_p, direction, clean, iters=10)
    assert 0.0 <= float(eps) <= 1.0
    # at the returned eps the loss should be around the clean threshold
    assert float(loss_of_p(float(eps) * direction)) >= 0.0


def test_grad_wrt_intermediate_end_to_end(tiny_cfg, tiny_batch):
    """The §3.3 motif: grad of decode-loss w.r.t. received y is finite,
    non-zero, and changes the loss when injected."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    inp = tiny_batch
    tar_inp, tar_real = inp[:, :-1], inp[:, 1:]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    key = jax.random.PRNGKey(1)

    tx = model.apply({"params": state.params}, inp, enc_m,
                     deterministic=True, method="encode")
    y = model.apply({"params": state.params}, key, tx,
                    jnp.zeros_like(tx), 0.0, 0.1, "AWGN", method="transmit")

    def loss_wrt_y(y):
        logits = model.apply({"params": state.params}, tar_inp, y, comb_m,
                             dec_m, deterministic=True, method="decode")
        return loss_function(tar_real, logits)

    l0, g = jax.value_and_grad(loss_wrt_y)(y)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 0
    # moving along the gradient increases the decode loss
    l1 = loss_wrt_y(y + 0.5 * fgm_normalize(g) * float(jnp.linalg.norm(y)))
    assert float(l1) > float(l0)


def test_pgd_eval_step(tiny_cfg, tiny_batch):
    """Full PGD eval: returns finite losses and eps in [0, 1]."""
    from deepsc_gan_tpu.train.steps import make_eval_step_pgd

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    pstep = make_eval_step_pgd(model, cfg, iters=5)
    clean, attacked, clean_lg, att_lg, eps = pstep(
        state, tiny_batch, tiny_batch, jax.random.PRNGKey(1), 10.0, 0.1, 1.0)
    assert np.isfinite(float(clean)) and np.isfinite(float(attacked))
    assert 0.0 <= float(eps) <= 1.0
    assert clean_lg.shape == att_lg.shape == (
        cfg.bs, cfg.seq_len - 1, cfg.vocab_size)
