"""Beam search: beam_size=1 == greedy; larger beams are valid and score
at least as well in sum-log-prob."""

import jax
import jax.numpy as jnp
import numpy as np

from deepsc_gan_tpu.evaluate.beam import make_beam_decode
from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.ops.masks import create_masks, create_padding_mask
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step


def _trained(cfg, batch, steps=60):
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(0)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, batch, sub, 0.05)
    return model, state


def _upto_end(ids, end_idx):
    """Zero out everything after (exclusive of) the first <END> — greedy
    keeps sampling past <END> (like the reference) while beam freezes
    finished hypotheses; only the pre-END prefix is semantic."""
    ids = np.array(ids)
    out = np.zeros_like(ids)
    for r in range(ids.shape[0]):
        row = ids[r]
        end = np.where(row == end_idx)[0]
        upto = (end[0] + 1) if len(end) else len(row)
        out[r, :upto] = row[:upto]
    return out


def test_beam1_equals_greedy(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model, state = _trained(cfg, tiny_batch, steps=30)
    greedy = make_greedy_decode(model, cfg)
    beam1 = make_beam_decode(model, cfg, beam_size=1)
    key = jax.random.PRNGKey(7)
    g = np.asarray(greedy(state.params, tiny_batch, key, 0.0, 0.1))
    b = np.asarray(beam1(state.params, tiny_batch, key, 0.0, 0.1))
    np.testing.assert_array_equal(_upto_end(g, cfg.end_idx),
                                  _upto_end(b, cfg.end_idx))


def _seq_logprob(model, cfg, params, inp, key, n_std, ids):
    """Sum log-prob of decoded ids under the model at the same channel
    realization."""
    enc_mask = create_padding_mask(inp, cfg.pad_idx)
    tx = model.apply({"params": params}, inp, enc_mask,
                     deterministic=True, method="encode")
    y = model.apply({"params": params}, key, tx, jnp.zeros_like(tx), 0.0,
                    n_std, "AWGN", method="transmit")
    tar_inp = ids[:, :-1]
    _, comb, dec = create_masks(inp, tar_inp, cfg.pad_idx)
    logits = model.apply({"params": params}, tar_inp, y, comb, dec,
                         deterministic=True, method="decode")
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    tgt = ids[:, 1:]
    return jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]


def test_beam_scores_at_least_greedy(tiny_cfg, tiny_batch):
    """Sum log-prob of the beam-4 sequence >= greedy sequence (same
    channel key) — the defining property of beam search."""
    cfg = tiny_cfg
    model, state = _trained(cfg, tiny_batch, steps=30)
    greedy = make_greedy_decode(model, cfg)
    beam = make_beam_decode(model, cfg, beam_size=4)
    key = jax.random.PRNGKey(3)
    # transmit uses the raw key inside decode; replicate that here
    g_ids = jnp.asarray(greedy(state.params, tiny_batch, key, 0.0, 0.3))
    b_ids = jnp.asarray(beam(state.params, tiny_batch, key, 0.0, 0.3))

    def total_lp(ids):
        lp = _seq_logprob(model, cfg, state.params, tiny_batch, key, 0.3,
                          ids)
        # score exactly what beam scored: every step until the beam froze
        # (first <END>); approximate by masking after first END in ids
        after_end = jnp.cumsum((ids[:, 1:] == cfg.end_idx).astype(
            jnp.int32), axis=1)
        mask = (after_end - (ids[:, 1:] == cfg.end_idx)) == 0
        return np.asarray(jnp.sum(lp * mask, axis=1))

    g_lp, b_lp = total_lp(g_ids), total_lp(b_ids)
    assert np.all(b_lp >= g_lp - 1e-4), (b_lp, g_lp)


def test_beam_kv_matches_full_prefix(tiny_cfg, tiny_batch):
    """The KV-cached beam (serving path) emits the SAME tokens as the
    full-prefix beam at float32 — caches gathered along the beam axis are
    exactly the recomputed prefixes. Trained params so the distribution
    isn't degenerate."""
    from deepsc_gan_tpu.evaluate.beam import make_beam_decode_kv

    cfg = tiny_cfg
    model, state = _trained(cfg, tiny_batch, steps=30)
    for ksize in (1, 4):
        full = make_beam_decode(model, cfg, beam_size=ksize)
        kv = make_beam_decode_kv(model, cfg, beam_size=ksize)
        key = jax.random.PRNGKey(11)
        a = np.asarray(full(state.params, tiny_batch, key, 0.0, 0.2))
        b = np.asarray(kv(state.params, tiny_batch, key, 0.0, 0.2))
        np.testing.assert_array_equal(a, b)


def test_beam_kv_matches_full_prefix_tied(tiny_cfg, tiny_batch):
    """Same parity through the tied-embedding projection layout."""
    from deepsc_gan_tpu.evaluate.beam import make_beam_decode_kv

    cfg = tiny_cfg.replace(tie_embeddings=True)
    model, state = _trained(cfg, tiny_batch, steps=20)
    full = make_beam_decode(model, cfg, beam_size=3)
    kv = make_beam_decode_kv(model, cfg, beam_size=3)
    key = jax.random.PRNGKey(5)
    a = np.asarray(full(state.params, tiny_batch, key, 0.0, 0.2))
    b = np.asarray(kv(state.params, tiny_batch, key, 0.0, 0.2))
    np.testing.assert_array_equal(a, b)


def test_beam_kv_sweep_matches_per_point(tiny_cfg, tiny_batch):
    """make_beam_decode_sweep == per-noise-level make_beam_decode_kv calls
    at the same derived keys."""
    from deepsc_gan_tpu.evaluate.beam import (
        make_beam_decode_kv,
        make_beam_decode_sweep,
    )

    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    sweep = make_beam_decode_sweep(model, cfg, beam_size=2)
    single = make_beam_decode_kv(model, cfg, beam_size=2)
    n_stds = jnp.asarray([0.5, 0.1])
    key = jax.random.PRNGKey(9)
    got = np.asarray(sweep(state.params, tiny_batch, key, 0.0, n_stds))
    keys = jax.random.split(key, 2)
    for s in range(2):
        want = np.asarray(single(state.params, tiny_batch, keys[s], 0.0,
                                 n_stds[s]))
        np.testing.assert_array_equal(got[s], want)


def test_beam_shapes_and_validity(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    beam = make_beam_decode(model, cfg, beam_size=3)
    ids = np.asarray(beam(state.params, tiny_batch, jax.random.PRNGKey(1),
                          0.0, 0.1))
    assert ids.shape == (cfg.bs, cfg.max_length + 1)
    assert np.all(ids[:, 0] == cfg.start_idx)
    assert ids.max() < cfg.vocab_size and ids.min() >= 0
