"""Greedy decoding: determinism, shapes, reconstruction after training on
a noiseless channel, attacked variants."""

import jax
import numpy as np

from deepsc_gan_tpu.evaluate.greedy import (
    make_greedy_decode,
    make_greedy_decode_attack,
)
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step


def test_decode_shapes_and_determinism(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    dec = make_greedy_decode(model, cfg)
    ids1 = dec(state.params, tiny_batch, jax.random.PRNGKey(9), 0.0, 0.1)
    ids2 = dec(state.params, tiny_batch, jax.random.PRNGKey(9), 0.0, 0.1)
    assert ids1.shape == (cfg.bs, cfg.max_length + 1)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    assert np.all(np.asarray(ids1)[:, 0] == cfg.start_idx)
    # different channel key -> (generally) different noise realization;
    # decode still valid ids
    ids3 = dec(state.params, tiny_batch, jax.random.PRNGKey(10), 0.0, 0.1)
    assert np.asarray(ids3).max() < cfg.vocab_size


def test_decode_reconstructs_after_training(tiny_cfg, tiny_batch):
    """Overfit one batch at near-zero noise: greedy decode should
    reproduce the input tokens (the end-to-end semantic-communication
    smoke test)."""
    cfg = tiny_cfg.replace(lr=3e-3, encoder_dropout=0.0,
                           decoder_dropout=0.0)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(0)
    for i in range(250):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.01)
    dec = make_greedy_decode(model, cfg)
    ids = np.asarray(dec(state.params, tiny_batch, jax.random.PRNGKey(1),
                         0.0, 0.01))
    ref = np.asarray(tiny_batch)
    # compare token-for-token over the non-pad positions of the target
    mask = ref[:, 1:] != cfg.pad_idx
    acc = float((ids[:, 1:][mask] == ref[:, 1:][mask]).mean())
    assert acc > 0.9, (acc, float(loss))


def test_attacked_decode_runs(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    dec = make_greedy_decode_attack(model, cfg)
    ids = dec(state.params, tiny_batch, jax.random.PRNGKey(1), 10.0, 0.1,
              1.0)
    assert ids.shape == (cfg.bs, cfg.max_length + 1)


def test_star_decode_positions(tiny_cfg, tiny_batch):
    """Star decoder: output read from the last memory position (reference
    [:, -1:] behavior), buffer still fills with valid ids."""
    cfg = tiny_cfg
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    dec = make_greedy_decode(model, cfg, position_mode="last")
    ids = np.asarray(dec(state.params, tiny_batch, jax.random.PRNGKey(1),
                         0.0, 0.1))
    assert ids.shape == (cfg.bs, cfg.max_length + 1)
    assert ids.max() < cfg.vocab_size and ids.min() >= 0


def test_sweep_decode_matches_pointwise(tiny_cfg, tiny_batch):
    """The vmapped all-SNR sweep must produce the same tokens as one-at-a-
    time decodes at the same derived keys."""
    import jax.numpy as jnp
    from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    sweep = make_greedy_decode_sweep(model, cfg)
    dec = make_greedy_decode(model, cfg)
    key = jax.random.PRNGKey(3)
    n_stds = jnp.asarray([1.0, 0.3, 0.1])
    ids = np.asarray(sweep(state.params, tiny_batch, key, 0.0, n_stds))
    assert ids.shape == (3, cfg.bs, cfg.max_length + 1)
    keys = jax.random.split(key, 3)
    for s in range(3):
        want = np.asarray(dec(state.params, tiny_batch, keys[s], 0.0,
                              float(n_stds[s])))
        np.testing.assert_array_equal(ids[s], want)


def test_star_oneshot_decode(tiny_cfg, tiny_batch):
    """Single-shot star decode: trained star model should reconstruct
    tokens position-wise at low noise (non-autoregressive objective)."""
    cfg = tiny_cfg.replace(lr=2e-3, encoder_dropout=0.0,
                           decoder_dropout=0.0)
    model = make_model(cfg, "star")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg, full_target=True)
    key = jax.random.PRNGKey(0)
    for i in range(200):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.01)
    dec = make_greedy_decode(model, cfg, position_mode="oneshot")
    ids = np.asarray(dec(state.params, tiny_batch, jax.random.PRNGKey(1),
                         0.0, 0.01))
    ref = np.asarray(tiny_batch)
    mask = ref[:, 1:] != cfg.pad_idx
    acc = float((ids[:, 1:][mask] == ref[:, 1:][mask]).mean())
    assert acc > 0.8, (acc, float(loss))
