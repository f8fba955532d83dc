"""Round-2 quality levers: tied embeddings, label smoothing, augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.data.augment import AugmentedDataset, make_train_dataset
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.ops.fused_ce import fused_ce_loss
from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.train.steps import (
    _final_wb,
    create_train_state,
    make_train_step,
)


# ---------------------------------------------------------------- tying ----

def test_tied_decoder_has_no_final_layer_and_matches_manual(tiny_cfg,
                                                            tiny_batch):
    cfg = tiny_cfg.replace(tie_embeddings=True)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    dec = state.params["semantic_decoder"]
    assert "final_layer" not in dec
    assert dec["final_bias"].shape == (cfg.vocab_size,)

    E = dec["embed"]["embedding"]["embedding"]
    h = jax.random.normal(jax.random.PRNGKey(1),
                          (cfg.bs, cfg.seq_len - 1, cfg.encoder_d_model))
    logits = model.apply({"params": state.params}, h,
                         method="final_projection")
    manual = h @ E.T + dec["final_bias"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(manual),
                               rtol=1e-5, atol=1e-5)

    W, b = _final_wb(state.params)
    np.testing.assert_array_equal(np.asarray(W), np.asarray(E.T))
    np.testing.assert_array_equal(np.asarray(b),
                                  np.asarray(dec["final_bias"]))


@pytest.mark.parametrize("fused", [False, True])
def test_tied_train_step_decreases_loss(tiny_cfg, tiny_batch, fused):
    cfg = tiny_cfg.replace(tie_embeddings=True, lr=2e-3, fused_ce=fused,
                           ce_chunk=16)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    e0 = np.asarray(
        state.params["semantic_decoder"]["embed"]["embedding"]["embedding"])
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(60):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.02)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[::8]
    # grads must flow into the tied table through the output projection
    e1 = np.asarray(
        state.params["semantic_decoder"]["embed"]["embedding"]["embedding"])
    assert np.abs(e1 - e0).max() > 1e-4


def test_untied_param_paths_unchanged(tiny_cfg):
    """Checkpoint compatibility: the default (untied) tree still has the
    round-1 layout after the TokenEmbed setup-style refactor."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    dec = state.params["semantic_decoder"]
    assert "final_layer" in dec
    assert "embedding" in dec["embed"]["embedding"]
    enc = state.params["semantic_encoder"]
    assert enc["embed"]["embedding"]["embedding"].shape == (
        cfg.vocab_size, cfg.encoder_d_model)


# ------------------------------------------------------------- smoothing ----

def test_label_smoothing_manual_parity():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (3, 5, 11))
    real = jax.random.randint(jax.random.PRNGKey(1), (3, 5), 0, 11)
    alpha = 0.1
    got = loss_function(real, logits, label_smoothing=alpha)

    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = (1 - alpha) * jax.nn.one_hot(real, 11) + alpha / 11
    ce = -jnp.sum(tgt * logp, axis=-1)
    mask = (real != 0).astype(jnp.float32)
    want = jnp.mean(ce * mask)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_label_smoothing_zero_is_reference():
    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (2, 4, 9))
    real = jax.random.randint(jax.random.PRNGKey(3), (2, 4), 0, 9)
    assert float(loss_function(real, logits)) == float(
        loss_function(real, logits, label_smoothing=0.0))


def test_fused_ce_smoothing_matches_naive():
    k = jax.random.PRNGKey(4)
    B, L, D, V = 2, 5, 8, 23
    h = jax.random.normal(k, (B, L, D))
    W = jax.random.normal(jax.random.PRNGKey(5), (D, V)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(6), (V,)) * 0.1
    real = jax.random.randint(jax.random.PRNGKey(7), (B, L), 0, V)
    logits = h @ W + b
    for alpha in (0.0, 0.1):
        naive = loss_function(real, logits, label_smoothing=alpha)
        fused = fused_ce_loss(h, W, b, real, chunk=8,
                              label_smoothing=alpha)
        np.testing.assert_allclose(float(fused), float(naive), rtol=1e-4)

    # gradient parity incl. the smoothing correction term
    alpha = 0.15
    gn = jax.grad(lambda hh, WW, bb: loss_function(
        real, hh @ WW + bb, label_smoothing=alpha), argnums=(0, 1, 2))(
            h, W, b)
    gf = jax.grad(lambda hh, WW, bb: fused_ce_loss(
        hh, WW, bb, real, chunk=8, label_smoothing=alpha),
        argnums=(0, 1, 2))(h, W, b)
    for a, bb_ in zip(gn, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------- augmentation ----

def _raw(n=40, seed=0, vmax=50):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 25))
        out.append([1] + rng.integers(4, vmax, size=k).tolist() + [2])
    return out


def _check_framing(batch, seq_len=31):
    assert batch.shape[1] == seq_len
    for row in batch:
        assert row[0] == 1
        (ends,) = np.nonzero(row == 2)
        assert len(ends) == 1
        e = ends[0]
        words = row[1:e]
        assert 4 <= len(words) <= seq_len - 2
        assert np.all(words >= 4)          # no specials inside
        assert np.all(row[e + 1:] == 0)    # all-pad tail


def test_augment_framing_and_shapes():
    ds = AugmentedDataset(_raw(), batch_size=8, crop_p=0.4, concat_p=0.3,
                          synth_p=0.2, vocab_size=50, seed=1)
    n = 0
    for inp, tar in ds:
        np.testing.assert_array_equal(inp, tar)
        _check_framing(inp)
        n += 1
    assert n == len(ds) == 5


def test_augment_deterministic_per_seed():
    a = np.concatenate([b for b, _ in AugmentedDataset(
        _raw(), batch_size=8, synth_p=0.5, vocab_size=50, seed=3)])
    b = np.concatenate([b for b, _ in AugmentedDataset(
        _raw(), batch_size=8, synth_p=0.5, vocab_size=50, seed=3)])
    np.testing.assert_array_equal(a, b)


def test_augment_synth_covers_full_vocab():
    ds = AugmentedDataset(_raw(n=200, vmax=10), batch_size=8, synth_p=1.0,
                          vocab_size=600, seed=0)
    seen = set()
    for _ in range(10):
        for inp, _ in ds:
            seen.update(int(t) for t in inp.ravel())
    # originals only touch ids < 10; synth must reach far beyond
    assert max(seen) > 500 and len(seen) > 300


def test_make_train_dataset_plain_when_no_aug(tiny_cfg):
    raw = _raw(vmax=tiny_cfg.vocab_size)
    ds = make_train_dataset(raw, tiny_cfg.replace(bs=8))
    from deepsc_gan_tpu.data.loader import Dataset
    assert isinstance(ds, Dataset)
    aug = make_train_dataset(raw, tiny_cfg.replace(bs=8, aug_crop=0.5))
    assert isinstance(aug, AugmentedDataset)


# ------------------------------------------------------- snr randomization ----

def test_step_noise_random_in_range(tiny_cfg):
    from deepsc_gan_tpu.train.steps import _step_noise
    cfg = tiny_cfg.replace(train_snr_random=True, train_snr_lo=0.0,
                           train_snr_hi=18.0)
    vals = [float(_step_noise(cfg, jax.random.PRNGKey(i), 0.5))
            for i in range(50)]
    # n_std = 10^(-snr/20): snr in [0, 18] -> n_std in [0.126, 1.0]
    assert all(0.1258 <= v <= 1.0 for v in vals)
    assert max(vals) - min(vals) > 0.2  # actually varies
    # fixed mode passes n_std through untouched
    assert float(_step_noise(tiny_cfg, jax.random.PRNGKey(0), 0.37)) == 0.37


def test_train_snr_random_trains(tiny_cfg, tiny_batch):
    cfg = tiny_cfg.replace(train_snr_random=True, lr=2e-3)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(50):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.1)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("variant", ["star", "star_multi"])
def test_tied_star_decoders_train(tiny_cfg, tiny_batch, variant):
    cfg = tiny_cfg.replace(tie_embeddings=True, lr=2e-3)
    model = make_model(cfg, variant)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    dec = state.params["semantic_decoder"]
    assert "final_layer" not in dec and "final_bias" in dec
    step = make_train_step(model, cfg, full_target=True)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(40):
        key, sub = jax.random.split(key)
        state, loss = step(state, tiny_batch, tiny_batch, sub, 0.02)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_step_noise_mix(tiny_cfg):
    from deepsc_gan_tpu.train.steps import _step_noise
    cfg = tiny_cfg.replace(train_snr_random=True, train_snr_mix=0.5,
                           train_snr_lo=0.0, train_snr_hi=18.0)
    fixed = 0.7071  # ~3dB
    vals = [float(_step_noise(cfg, jax.random.PRNGKey(i), fixed))
            for i in range(80)]
    n_fixed = sum(abs(v - fixed) < 1e-6 for v in vals)
    assert 15 < n_fixed < 65          # bernoulli actually mixes
    assert any(abs(v - fixed) > 0.05 for v in vals)  # and draws vary
