"""GAN three-phase step: partition correctness and shared-Adam semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.gan_steps import (
    GENERATOR,
    TX_SIDE,
    make_gan_eval_step,
    make_gan_train_step,
    phase_mask,
    selective_update,
)
from deepsc_gan_tpu.train.steps import create_train_state


@pytest.fixture(scope="module")
def gan_setup(tiny_cfg):
    model = make_model(tiny_cfg, "gan")
    state = create_train_state(model, tiny_cfg, jax.random.PRNGKey(0),
                               batch_size=tiny_cfg.bs, traingan=True)
    return model, state


def test_phase_mask_partitions(gan_setup):
    _, state = gan_setup
    m_gen = phase_mask(state.params, include=(GENERATOR,))
    m_codec = phase_mask(state.params, exclude=(GENERATOR,))
    m_rx = phase_mask(state.params, exclude=TX_SIDE)
    assert all(jax.tree.leaves(m_gen["generator"]))
    assert not any(jax.tree.leaves(m_gen["semantic_encoder"]))
    assert not any(jax.tree.leaves(m_codec["generator"]))
    assert all(jax.tree.leaves(m_codec["semantic_decoder"]))
    assert not any(jax.tree.leaves(m_rx["semantic_encoder"]))
    assert not any(jax.tree.leaves(m_rx["channel_encoder"]))
    assert all(jax.tree.leaves(m_rx["channel_decoder"]))


def test_selective_update_freezes_masked(gan_setup):
    _, state = gan_setup
    grads = jax.tree.map(jnp.ones_like, state.params)
    mask = phase_mask(state.params, include=(GENERATOR,))
    new = selective_update(state, grads, mask)
    # generator moved, everything else identical
    for g_old, g_new in zip(jax.tree.leaves(state.params["generator"]),
                            jax.tree.leaves(new.params["generator"])):
        assert not np.allclose(np.asarray(g_old), np.asarray(g_new))
    for k in state.params:
        if k == "generator":
            continue
        for a, b in zip(jax.tree.leaves(state.params[k]),
                        jax.tree.leaves(new.params[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_selective_update_preserves_frozen_moments(gan_setup):
    """Adam moments of masked-out params must not decay (TF semantics of
    apply_gradients over a filtered var list)."""
    _, state = gan_setup
    # seed non-zero moments everywhere with one full update
    grads = jax.tree.map(jnp.ones_like, state.params)
    full_mask = jax.tree.map(lambda _: True, state.params)
    state1 = selective_update(state, grads, full_mask)
    # now a generator-only update must leave other moments bit-identical
    state2 = selective_update(state1, grads,
                              phase_mask(state.params,
                                         include=(GENERATOR,)))
    mu1 = state1.opt_state[0].mu
    mu2 = state2.opt_state[0].mu
    for k in mu1:
        leaves1, leaves2 = jax.tree.leaves(mu1[k]), jax.tree.leaves(mu2[k])
        for a, b in zip(leaves1, leaves2):
            if k == "generator":
                assert not np.allclose(np.asarray(a), np.asarray(b))
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_train_step_improves_receiver(tiny_cfg, tiny_batch, gan_setup):
    model, state = gan_setup
    step = make_gan_train_step(model, tiny_cfg)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(20):
        key, sub = jax.random.split(key)
        state, (loss, g_loss, d_loss) = step(state, tiny_batch, tiny_batch,
                                             sub, 0.02)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))


def test_gan_eval_step(tiny_cfg, tiny_batch, gan_setup):
    model, state = gan_setup
    ev = make_gan_eval_step(model, tiny_cfg)
    cl, al, clean_logits, att_logits = ev(state, tiny_batch, tiny_batch,
                                          jax.random.PRNGKey(1), 10.0, 0.1,
                                          1.0)
    assert np.isfinite(float(cl)) and np.isfinite(float(al))
    assert clean_logits.shape == att_logits.shape


def test_merge_opt_state_rejects_unknown_param_slots():
    """An optimizer with per-param slots we don't explicitly handle must
    raise, not silently mis-merge (round-1 weak #6)."""
    import optax
    import pytest as _pytest
    from deepsc_gan_tpu.train.gan_steps import _merge_opt_state

    params = {"a": jnp.ones((3,))}
    tx = optax.sgd(1e-2, momentum=0.9)  # ScaleByMomentumState-like trace
    s0 = tx.init(params)
    _, s1 = tx.update({"a": jnp.ones((3,))}, s0, params)
    mask = {"a": jnp.asarray(True)}
    with _pytest.raises(ValueError, match="unhandled optax state"):
        _merge_opt_state(s1, s0, mask)


def test_merge_opt_state_handles_schedule_chain():
    """Adam behind a schedule chain (extra scalar states) merges fine."""
    import optax
    from deepsc_gan_tpu.train.gan_steps import _merge_opt_state

    params = {"a": jnp.ones((3,)), "b": jnp.ones((2,))}
    tx = optax.chain(optax.scale_by_adam(),
                     optax.scale_by_schedule(lambda i: 1e-3))
    s0 = tx.init(params)
    g = {"a": jnp.ones((3,)), "b": jnp.ones((2,))}
    _, s1 = tx.update(g, s0, params)
    mask = {"a": jnp.asarray(True), "b": jnp.asarray(False)}
    merged = _merge_opt_state(s1, s0, mask)
    adam = merged[0]
    np.testing.assert_array_equal(adam.mu["a"], s1[0].mu["a"])  # updated
    np.testing.assert_array_equal(adam.mu["b"], s0[0].mu["b"])  # frozen
    assert int(adam.count) == int(s1[0].count)


def test_codec_warm_start_graft(tiny_cfg, gan_setup):
    """scripts/gan_tables.graft_codec: plain-trained codec submodules drop
    into a fresh GAN tree; the generator stays freshly initialized."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.gan_tables import CODEC_KEYS, graft_codec

    _, gan_state = gan_setup
    plain_model = make_model(tiny_cfg, "transformer")
    plain_state = create_train_state(plain_model, tiny_cfg,
                                     jax.random.PRNGKey(7),
                                     batch_size=tiny_cfg.bs)
    grafted = graft_codec(gan_state.params, plain_state.params)
    for k in CODEC_KEYS:
        ok = jax.tree.all(jax.tree.map(
            lambda a, b: jnp.array_equal(a, b),
            grafted[k], plain_state.params[k]))
        assert ok, k
    # generator untouched by the graft
    ok = jax.tree.all(jax.tree.map(
        lambda a, b: jnp.array_equal(a, b),
        grafted["generator"], gan_state.params["generator"]))
    assert ok


def test_gan_star_train_and_eval(tiny_cfg, tiny_batch):
    """gan_star (extension beyond the reference — its Transeiver_GAN is
    vanilla-only, transceiver.py:247): the 3-phase GAN step runs on the
    SE/SD star codec with full-target losses, improves the receiver, and
    the FGM eval step produces memory-length logits."""
    model = make_model(tiny_cfg, "gan_star")
    state = create_train_state(model, tiny_cfg, jax.random.PRNGKey(0),
                               batch_size=tiny_cfg.bs, traingan=True)
    # param tree carries the star codec AND the generator
    assert "generator" in state.params
    assert "block" in state.params["semantic_decoder"]  # SD single block

    step = make_gan_train_step(model, tiny_cfg, full_target=True)
    key = jax.random.PRNGKey(0)
    first = None
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, (loss, g_loss, d_loss) = step(state, tiny_batch, tiny_batch,
                                             sub, 0.02)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))

    ev = make_gan_eval_step(model, tiny_cfg, full_target=True)
    cl, al, clean_logits, att_logits = ev(state, tiny_batch, tiny_batch,
                                          jax.random.PRNGKey(1), 10.0, 0.1,
                                          1.0)
    assert np.isfinite(float(cl)) and np.isfinite(float(al))
    # star decoders output at MEMORY length (= seq_len), not seq_len - 1
    assert clean_logits.shape == (tiny_cfg.bs, tiny_cfg.seq_len,
                                  tiny_cfg.vocab_size)
    assert att_logits.shape == clean_logits.shape
