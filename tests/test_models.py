"""Model assemblies: shapes, variants, staged forward consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.models.channel import ChannelDecoder, ChannelEncoder
from deepsc_gan_tpu.models.gan import (
    Discriminator,
    DiscriminatorCNN,
    Generator,
    GeneratorCNN,
)
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.ops.masks import create_masks, create_padding_mask
from deepsc_gan_tpu.train.steps import create_train_state


def _state(model, cfg, variant):
    kw = {"traingan": True} if variant == "gan" else {}
    return create_train_state(model, cfg, jax.random.PRNGKey(0),
                              batch_size=cfg.bs, **kw)


@pytest.mark.parametrize("variant", ["transformer", "star_multi", "star"])
def test_transceiver_forward_shapes(tiny_cfg, tiny_batch, variant):
    cfg = tiny_cfg
    model = make_model(cfg, variant)
    state = _state(model, cfg, variant)
    inp = tiny_batch
    tar_inp = inp[:, :-1]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    logits, tx, y, y2 = model.apply(
        {"params": state.params}, inp, tar_inp, jax.random.PRNGKey(1),
        jnp.zeros((cfg.bs, cfg.seq_len, cfg.channel_dim)), 0.0, "AWGN",
        0.1, enc_m, comb_m, dec_m, deterministic=True)
    assert tx.shape == (cfg.bs, cfg.seq_len, cfg.channel_dim)
    assert y.shape == tx.shape
    # star decoders output at MEMORY length; vanilla at target length
    out_len = cfg.seq_len if variant != "transformer" else cfg.seq_len - 1
    assert logits.shape == (cfg.bs, out_len, cfg.vocab_size)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_gan_transceiver_outputs(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "gan")
    state = _state(model, cfg, "gan")
    inp = tiny_batch
    tar_inp = inp[:, :-1]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    p = jnp.zeros((cfg.bs, cfg.seq_len, cfg.channel_dim))
    pred_p, pred_r, tx, y_r = model.apply(
        {"params": state.params}, inp, tar_inp, jax.random.PRNGKey(1), p,
        40.0, "AWGN", 0.1, enc_m, comb_m, dec_m, deterministic=True,
        traingan=True)
    assert pred_p.shape == pred_r.shape == (cfg.bs, cfg.seq_len - 1,
                                            cfg.vocab_size)
    # perturbed and clean branches must differ (generator injects power)
    assert not np.allclose(np.asarray(pred_p), np.asarray(pred_r))


def test_staged_forward_equals_composed(tiny_cfg, tiny_batch):
    """encode+transmit+decode staged calls == __call__ at the same key."""
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = _state(model, cfg, "transformer")
    inp = tiny_batch
    tar_inp = inp[:, :-1]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    key = jax.random.PRNGKey(3)
    p = jnp.zeros((cfg.bs, cfg.seq_len, cfg.channel_dim))

    logits_full, tx_full, y_full, _ = model.apply(
        {"params": state.params}, inp, tar_inp, key, p, 0.0, "AWGN", 0.1,
        enc_m, comb_m, dec_m, deterministic=True)

    tx = model.apply({"params": state.params}, inp, enc_m,
                     deterministic=True, method="encode")
    y = model.apply({"params": state.params}, key, tx, p, 0.0, 0.1, "AWGN",
                    method="transmit")
    logits = model.apply({"params": state.params}, tar_inp, y, comb_m,
                         dec_m, deterministic=True, method="decode")
    np.testing.assert_allclose(np.asarray(tx), np.asarray(tx_full),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_full),
                               atol=1e-5)


def test_channel_codec_shapes():
    enc = ChannelEncoder(hidden=24, out_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    tx = enc.apply({"params": params}, x)
    assert tx.shape == (2, 5, 8)
    assert np.isclose(float(jnp.mean(tx**2)), 1.0, atol=1e-5)

    dec = ChannelDecoder(d_model=16, hidden=32)
    dparams = dec.init(jax.random.PRNGKey(0), tx)["params"]
    out = dec.apply({"params": dparams}, tx)
    assert out.shape == (2, 5, 16)


def test_generator_half_power():
    g = Generator(hidden=24, out_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    params = g.init(jax.random.PRNGKey(0), x)["params"]
    p = g.apply({"params": params}, x)
    assert p.shape == x.shape
    assert np.isclose(float(jnp.mean(p**2)), 0.5, atol=1e-5)


def test_discriminator_and_cnn_variants():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8))
    for mod, out_dim in ((Discriminator(hidden=16, out_dim=8), 8),
                         (GeneratorCNN(filters=8, kernel=4, out_dim=8), 8),
                         (DiscriminatorCNN(filters=8, kernel=4, hidden=12),
                          12)):
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        y = mod.apply({"params": params}, x)
        assert y.shape == (2, 6, out_dim)


def test_dropout_changes_with_rng(tiny_cfg, tiny_batch):
    cfg = tiny_cfg
    model = make_model(cfg, "transformer")
    state = _state(model, cfg, "transformer")
    inp = tiny_batch
    enc_m = create_padding_mask(inp)

    def enc(do_key):
        return model.apply({"params": state.params}, inp, enc_m,
                           deterministic=False, method="encode",
                           rngs={"dropout": do_key})

    a = enc(jax.random.PRNGKey(0))
    b = enc(jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c = enc(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.parametrize("variant", ["transformer", "star", "star_multi"])
def test_qkv_fusion_equivalence(tiny_cfg, tiny_batch, variant):
    """set_qkv_fusion packs the Q/K/V matmuls at TRACE time only: the param
    tree is bit-identical under either setting, and forward logits + a
    training gradient agree to f32 reduction tolerance (VERDICT r4 item 4,
    the d256 layout-copy bucket's packed-QKV lever)."""
    from deepsc_gan_tpu.ops.attention import qkv_fusion, set_qkv_fusion

    cfg = tiny_cfg
    model = make_model(cfg, variant)
    inp = tiny_batch
    tar_inp = inp[:, :-1]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    p = jnp.zeros((cfg.bs, cfg.seq_len, cfg.channel_dim))

    def fwd_and_grad(fuse):
        prev = qkv_fusion()
        set_qkv_fusion(fuse)
        try:
            state = _state(model, cfg, variant)

            def loss(params):
                logits, _, _, _ = model.apply(
                    {"params": params}, inp, tar_inp, jax.random.PRNGKey(1),
                    p, 0.0, "AWGN", 0.1, enc_m, comb_m, dec_m,
                    deterministic=True)
                return jnp.mean(logits.astype(jnp.float32) ** 2)

            val, grad = jax.value_and_grad(loss)(state.params)
            return state.params, val, grad
        finally:
            set_qkv_fusion(prev)

    p0, v0, g0 = fwd_and_grad(False)
    p1, v1, g1 = fwd_and_grad(True)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, p1))
    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-5)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6, err_msg=str(ka))


@pytest.mark.parametrize("variant", ["transformer", "star", "star_multi"])
def test_head_layout_equivalence(tiny_cfg, tiny_batch, variant):
    """set_head_layout("bhld") re-traces the attention chain in the
    (B, H, L, Dh) layout (no transposed einsum operands — the d256
    copy-bucket lever after packed QKV was rejected): the param tree is
    bit-identical under either layout, and forward logits + a training
    gradient agree to f32 reduction tolerance."""
    from deepsc_gan_tpu.ops.attention import head_layout, set_head_layout

    cfg = tiny_cfg
    model = make_model(cfg, variant)
    inp = tiny_batch
    tar_inp = inp[:, :-1]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    p = jnp.zeros((cfg.bs, cfg.seq_len, cfg.channel_dim))

    def fwd_and_grad(layout):
        prev = head_layout()
        set_head_layout(layout)
        try:
            state = _state(model, cfg, variant)

            def loss(params):
                logits, _, _, _ = model.apply(
                    {"params": params}, inp, tar_inp, jax.random.PRNGKey(1),
                    p, 0.0, "AWGN", 0.1, enc_m, comb_m, dec_m,
                    deterministic=True)
                return jnp.mean(logits.astype(jnp.float32) ** 2)

            val, grad = jax.value_and_grad(loss)(state.params)
            return state.params, val, grad
        finally:
            set_head_layout(prev)

    p0, v0, g0 = fwd_and_grad("blhd")
    p1, v1, g1 = fwd_and_grad("bhld")
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, p1))
    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-5)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6, err_msg=str(ka))


@pytest.mark.parametrize("variant", ["transformer", "gan"])
def test_attn_kernel_model_equivalence(tiny_cfg, tiny_batch, variant):
    """The fused Pallas attention (ops/pallas/attention.py, run under the
    interpreter on CPU) traced through the FULL transceiver — both mask
    shapes (padding (B,1,1,Lk) on the encoder, combined (B,1,Lq,Lk) on
    the decoder) collapse to the kernel's additive bias — matches the
    einsum path: identical params, matching loss and training gradient.
    Model-level companion to tests/test_ops.py's op-level checks."""
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode

    cfg = tiny_cfg
    model = make_model(cfg, variant)
    inp = tiny_batch
    tar_inp = inp[:, :-1]
    enc_m, comb_m, dec_m = create_masks(inp, tar_inp)
    p = jnp.zeros((cfg.bs, cfg.seq_len, cfg.channel_dim))
    gan = variant == "gan"

    def fwd_and_grad(mode):
        set_attn_kernel_mode(mode)
        try:
            state = _state(model, cfg, variant)

            def loss(params):
                kw = {"traingan": True} if gan else {}
                out = model.apply(
                    {"params": params}, inp, tar_inp, jax.random.PRNGKey(1),
                    p, 0.0, "AWGN", 0.1, enc_m, comb_m, dec_m,
                    deterministic=True, **kw)
                logits = out[0]
                return jnp.mean(logits.astype(jnp.float32) ** 2)

            val, grad = jax.value_and_grad(loss)(state.params)
            return state.params, val, grad
        finally:
            set_attn_kernel_mode("auto")

    p0, v0, g0 = fwd_and_grad("xla")
    p1, v1, g1 = fwd_and_grad("interpret")
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, p1))
    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-5)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5, err_msg=str(ka))
