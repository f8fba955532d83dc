"""Checkpoint/resume: exact state round-trip, keep-N retention."""

import os

import jax
import numpy as np

from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step
from deepsc_gan_tpu.utils.checkpoint import CheckpointManager


def test_checkpoint_round_trip(tiny_cfg, tiny_batch, tmp_path):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg)
    state, _ = step(state, tiny_batch, tiny_batch, jax.random.PRNGKey(1),
                    0.1)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    mgr.save(1, state)
    assert mgr.latest_epoch() == 1

    fresh = create_train_state(model, cfg, jax.random.PRNGKey(99),
                               batch_size=cfg.bs)
    restored = mgr.restore(fresh)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # optimizer moments restored too (exact resume)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_keep_n(tiny_cfg, tiny_batch, tmp_path):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for epoch in (1, 2, 3, 4):
        mgr.save(epoch, state)
    mgr.wait()  # saves are async by default; join before inspecting disk
    assert mgr.latest_epoch() == 4
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ckpt")
                  if d.isdigit())
    assert kept == [3, 4]
    mgr.close()


def test_resume_continues_identically(tiny_cfg, tiny_batch, tmp_path):
    """Save at step k, keep training; restore and retrain with identical
    keys -> identical params (exact resume semantics)."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    step = make_train_step(model, cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    state, _ = step(state, tiny_batch, tiny_batch, jax.random.PRNGKey(1),
                    0.1)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    state_a, _ = step(state, tiny_batch, tiny_batch, jax.random.PRNGKey(2),
                      0.1)

    fresh = create_train_state(model, cfg, jax.random.PRNGKey(50),
                               batch_size=cfg.bs)
    restored = mgr.restore(fresh)
    state_b, _ = step(restored, tiny_batch, tiny_batch,
                      jax.random.PRNGKey(2), 0.1)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
