"""Star-Transformer: layer shapes, weight-sharing quirks, satellite math."""

import jax
import jax.numpy as jnp
import numpy as np

from deepsc_gan_tpu.models.star import (
    SD,
    SE,
    SDecoder,
    SEncoder,
    StarAttention,
    StarDecoderLayer,
    StarEncoderLayer,
)
from deepsc_gan_tpu.ops.masks import create_look_ahead_mask

B, L, D, H = 2, 6, 8, 2


def test_star_encoder_layer_shapes():
    layer = StarEncoderLayer(cycle_num=2, d_model=D, num_heads=H, dff=16)
    e = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    params = layer.init(jax.random.PRNGKey(1), e, deterministic=True)["params"]
    out, s = layer.apply({"params": params}, e, deterministic=True)
    assert out.shape == (B, L, D) and s.shape == (B, D)


def test_star_relay_weight_sharing_quirk():
    """Multi-layer variant reuses satellite weights for the relay
    (modules.py:175) — no att_relay params; STE-style has them."""
    e = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    shared = StarEncoderLayer(cycle_num=1, d_model=D, num_heads=H, dff=16,
                              separate_relay=False)
    p1 = shared.init(jax.random.PRNGKey(1), e, deterministic=True)["params"]
    assert "att_relay" not in p1
    sep = StarEncoderLayer(cycle_num=1, d_model=D, num_heads=H, dff=16,
                           separate_relay=True)
    p2 = sep.init(jax.random.PRNGKey(1), e, deterministic=True)["params"]
    assert "att_relay" in p2


def test_star_decoder_layer_target_enters_via_relay():
    """The decoder output length equals the MEMORY length, and the target
    stream influences it only through the relay node."""
    layer = StarDecoderLayer(cycle_num=2, d_model=D, num_heads=H, dff=16)
    tar = jax.random.normal(jax.random.PRNGKey(0), (B, L - 1, D))
    e = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    mask = create_look_ahead_mask(L - 1)
    params = layer.init(jax.random.PRNGKey(2), tar, e, mask,
                        deterministic=True)["params"]
    out, s = layer.apply({"params": params}, tar, e, mask,
                         deterministic=True)
    assert out.shape == (B, L, D)
    # changing the target changes the output (via relay)
    out2, _ = layer.apply({"params": params}, tar * 2.0, e, mask,
                          deterministic=True)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_satellite_neighbor_locality():
    """Each satellite attends only to {i-1, i, i+1, e_i, s}: with the relay
    and e fixed, perturbing position j affects... (via s all positions move,
    so test the direct path with cycle_num irrelevant: use StarAttention
    directly)."""
    att = StarAttention(d_model=D, num_heads=H)
    h = jax.random.normal(jax.random.PRNGKey(0), (1, L, D))
    e = jax.random.normal(jax.random.PRNGKey(1), (1, L, D))
    s = jnp.zeros((1, D))
    params = att.init(jax.random.PRNGKey(2), h, h, h)["params"]
    base = att.apply({"params": params}, h, e, s, method="satellite")
    h2 = h.at[0, 3].set(h[0, 3] + 10.0)
    out2 = att.apply({"params": params}, h2, e, s, method="satellite")
    diff = np.abs(np.asarray(base) - np.asarray(out2)).sum(-1)[0]
    # positions 2,3,4 see the change; 0 and L-2 don't (position L-1 wraps
    # to 0 via the ring roll — check a position far from 3 and the wrap)
    assert diff[2] > 1e-4 and diff[3] > 1e-4 and diff[4] > 1e-4
    assert diff[0] < 1e-5 and diff[1] < 1e-5


def test_star_stacks_shapes(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    inp = tiny_batch
    tar = inp[:, :-1]
    mask = create_look_ahead_mask(tar.shape[1])

    enc = SEncoder(cfg.cycle_num, 2, 2, D, 16, cfg.vocab_size)
    p = enc.init(jax.random.PRNGKey(0), inp, deterministic=True)["params"]
    x = enc.apply({"params": p}, inp, deterministic=True)
    assert x.shape == (cfg.bs, cfg.seq_len, D)

    dec = SDecoder(cfg.cycle_num, 2, D, 2, 16, cfg.vocab_size)
    pd = dec.init(jax.random.PRNGKey(0), tar, x, mask,
                  deterministic=True)["params"]
    logits = dec.apply({"params": pd}, tar, x, mask, deterministic=True)
    assert logits.shape == (cfg.bs, cfg.seq_len, cfg.vocab_size)

    se = SE(cfg.cycle_num, 2, D, 16, cfg.vocab_size)
    ps = se.init(jax.random.PRNGKey(0), inp, deterministic=True)["params"]
    xs = se.apply({"params": ps}, inp, deterministic=True)
    assert xs.shape == (cfg.bs, cfg.seq_len, D)

    sd = SD(cfg.cycle_num, D, 2, 16, cfg.vocab_size)
    psd = sd.init(jax.random.PRNGKey(0), tar, xs, mask,
                  deterministic=True)["params"]
    ls = sd.apply({"params": psd}, tar, xs, mask, deterministic=True)
    assert ls.shape == (cfg.bs, cfg.seq_len, cfg.vocab_size)
    # single-block SE/SD use separate relay weights (reference STE/STD)
    assert "att_relay" in ps["block"] and "att_relay" in psd["block"]
