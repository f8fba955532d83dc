"""Core ops: positional encoding, masks, loss, schedule, attention."""

import jax
import jax.numpy as jnp
import numpy as np

from deepsc_gan_tpu.ops.attention import MultiHeadAttention
from deepsc_gan_tpu.ops.losses import (
    cross_entropy_per_token,
    loss_function,
    masked_mean_loss,
)
from deepsc_gan_tpu.ops.masks import (
    create_look_ahead_mask,
    create_masks,
    create_padding_mask,
)
from deepsc_gan_tpu.ops.positional import positional_encoding
from deepsc_gan_tpu.ops.schedule import noam_schedule


def test_positional_encoding_values():
    pe = np.asarray(positional_encoding(50, 8))
    assert pe.shape == (1, 50, 8)
    # hand-computed spot checks against the reference formula
    # (modules.py:11-19: rate uses RAW channel index i)
    for pos in (0, 3, 17):
        for i in (0, 2, 4):
            angle = pos / 10000 ** (2 * i / 8)
            assert np.isclose(pe[0, pos, i], np.sin(angle), atol=1e-6)
        for i in (1, 3, 5):
            angle = pos / 10000 ** (2 * i / 8)
            assert np.isclose(pe[0, pos, i], np.cos(angle), atol=1e-6)


def test_padding_mask():
    seq = jnp.array([[5, 3, 0, 0], [1, 0, 2, 0]])
    m = np.asarray(create_padding_mask(seq))
    assert m.shape == (2, 1, 1, 4)
    np.testing.assert_array_equal(m[0, 0, 0], [0, 0, 1, 1])
    np.testing.assert_array_equal(m[1, 0, 0], [0, 1, 0, 1])


def test_look_ahead_mask():
    m = np.asarray(create_look_ahead_mask(4))
    expected = np.triu(np.ones((4, 4)), k=1)
    np.testing.assert_array_equal(m, expected)


def test_combined_mask():
    inp = jnp.array([[1, 2, 0]])
    tar = jnp.array([[1, 0, 3]])
    enc, combined, dec = create_masks(inp, tar)
    assert enc.shape == (1, 1, 1, 3) and combined.shape == (1, 1, 3, 3)
    c = np.asarray(combined[0, 0])
    # row 0: causal blocks cols 1,2; col 1 also padded
    np.testing.assert_array_equal(c[0], [0, 1, 1])
    np.testing.assert_array_equal(c[1], [0, 1, 1])
    np.testing.assert_array_equal(c[2], [0, 1, 0])


def test_cross_entropy_matches_manual():
    logits = jnp.array([[[2.0, 0.0, -1.0], [0.5, 0.5, 0.5]]])
    real = jnp.array([[0, 2]])
    ce = np.asarray(cross_entropy_per_token(real, logits))
    manual = -np.log(np.exp(2.0) / np.exp([2.0, 0.0, -1.0]).sum())
    assert np.isclose(ce[0, 0], manual, atol=1e-6)
    assert np.isclose(ce[0, 1], np.log(3.0), atol=1e-6)


def test_loss_function_pad_only_mean_over_all():
    """Reference-parity: padded positions contribute ZEROS to a mean over
    ALL positions (modules.py:751-755)."""
    logits = jnp.zeros((1, 4, 5))
    real = jnp.array([[1, 2, 0, 0]])  # 2 real + 2 pad
    loss = float(loss_function(real, logits))
    per_tok = np.log(5.0)
    assert np.isclose(loss, per_tok * 2 / 4, atol=1e-6)
    # the pad-invariant variant divides by the unmasked count instead
    assert np.isclose(float(masked_mean_loss(real, logits)), per_tok,
                      atol=1e-6)


def test_loss_function_extra_ids_masked():
    logits = jnp.zeros((1, 4, 8))
    real = jnp.array([[4, 5, 6, 0]])
    base = float(loss_function(real, logits))
    strict = float(loss_function(real, logits, extra_masked_ids=(4, 5)))
    per_tok = np.log(8.0)
    assert np.isclose(base, per_tok * 3 / 4, atol=1e-6)
    assert np.isclose(strict, per_tok * 1 / 4, atol=1e-6)


def test_noam_schedule():
    sched = noam_schedule(128, warmup_steps=4000)
    # increasing during warmup, decreasing after
    assert float(sched(100)) < float(sched(1000)) < float(sched(4000))
    assert float(sched(4000)) > float(sched(16000))
    peak = 128 ** -0.5 * 4000 ** -0.5
    assert np.isclose(float(sched(4000)), peak, rtol=1e-5)


def _naive_mha(x, params, num_heads):
    """Numpy re-derivation of the attention math for q=k=v=x, no mask."""
    wq = np.asarray(params["wq"]["kernel"])  # (D, H, dh)
    wk = np.asarray(params["wk"]["kernel"])
    wv = np.asarray(params["wv"]["kernel"])
    wo = np.asarray(params["out"]["kernel"])  # (H, dh, D)
    bo = np.asarray(params["out"]["bias"])
    q = np.einsum("bld,dhe->blhe", x, wq)
    k = np.einsum("bld,dhe->blhe", x, wk)
    v = np.einsum("bld,dhe->blhe", x, wv)
    dh = q.shape[-1]
    logits = np.einsum("bqhe,bkhe->bhqk", q, k) / np.sqrt(dh)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhe->bqhe", w, v)
    return np.einsum("bqhe,hed->bqd", out, wo) + bo


def test_mha_matches_naive():
    mha = MultiHeadAttention(d_model=16, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
    got = np.asarray(mha.apply({"params": params}, x, x, x))
    want = _naive_mha(np.asarray(x), params, 4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mha_masking_blocks_positions():
    """A key fully masked for every query must not influence the output."""
    mha = MultiHeadAttention(d_model=8, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
    mask = jnp.zeros((1, 1, 1, 4)).at[..., 3].set(1.0)
    out1 = mha.apply({"params": params}, x, x, x, mask)
    x2 = x.at[:, 3].set(999.0)  # perturb the masked key/value position
    out2 = mha.apply({"params": params}, x2, x2, x2, mask)
    # rows 0-2 can't see position 3
    np.testing.assert_allclose(np.asarray(out1)[:, :3],
                               np.asarray(out2)[:, :3], atol=1e-4)


# ---- fused Pallas attention (ops/pallas/attention.py) ----------------


def _attn_einsum_ref(q3, k3, v3, bias, heads, scale):
    """The ops/attention.py einsum math on 3-D packed tensors."""
    b, lq, hd = q3.shape
    lk = k3.shape[1]
    dh = hd // heads
    q = q3.reshape(b, lq, heads, dh)
    k = k3.reshape(b, lk, heads, dh)
    v = v3.reshape(b, lk, heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / scale
    s = s + bias[:, None]
    p = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, lq, hd)


import pytest  # noqa: E402


@pytest.mark.parametrize("shape", [
    (4, 8, 8, 2, 8),    # aligned self-attention-ish
    (4, 7, 9, 2, 8),    # unaligned Lq/Lk (the L=31 decoder case)
    (6, 1, 12, 3, 4),   # Lq=1 (star relay query)
])
def test_fused_attention_matches_einsum(shape):
    """Kernel fwd + all four grads == the einsum path to f32 tolerance,
    including non-tile-aligned Lq/Lk (Mosaic pads blocks internally)."""
    from deepsc_gan_tpu.ops.pallas.attention import (
        fused_attention,
        set_attn_kernel_mode,
    )

    b, lq, lk, h, dh = shape
    hd = h * dh
    q3 = jax.random.normal(jax.random.PRNGKey(0), (b, lq, hd), jnp.float32)
    k3 = jax.random.normal(jax.random.PRNGKey(1), (b, lk, hd), jnp.float32)
    v3 = jax.random.normal(jax.random.PRNGKey(2), (b, lk, hd), jnp.float32)
    bias = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(3), (b, lq, lk)) > 0.7,
        -1e9, 0.0).astype(jnp.float32)
    scale = float(np.sqrt(dh))

    set_attn_kernel_mode("interpret")
    try:
        out = fused_attention(q3, k3, v3, bias, h, scale)
        ref = _attn_einsum_ref(q3, k3, v3, bias, h, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

        def k_loss(*a):
            return jnp.sum(jnp.sin(fused_attention(*a, h, scale)))

        def r_loss(*a):
            return jnp.sum(jnp.sin(_attn_einsum_ref(*a, h, scale)))

        gk = jax.grad(k_loss, argnums=(0, 1, 2, 3))(q3, k3, v3, bias)
        gr = jax.grad(r_loss, argnums=(0, 1, 2, 3))(q3, k3, v3, bias)
        for name, a, r in zip("qkvb", gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=2e-6, err_msg=f"d{name}")
    finally:
        set_attn_kernel_mode("auto")


def test_fused_attention_module_equivalence():
    """MultiHeadAttention traced through the kernel path ("interpret")
    == the default einsum path: identical params, matching output and
    input gradient (the module-level wiring: 3-D projections, mask ->
    additive bias collapse, context re-pack)."""
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode

    mha = MultiHeadAttention(d_model=16, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 10, 16), jnp.float32)
    mask = create_padding_mask(
        jnp.array([[1] * 7 + [0] * 3, [1] * 10, [1] * 4 + [0] * 6],
                  jnp.int32))

    def run(mode):
        set_attn_kernel_mode(mode)
        try:
            params = mha.init(jax.random.PRNGKey(1), x, x, x, mask)

            def loss(p, x):
                return jnp.sum(mha.apply(p, x, x, x, mask) ** 2)

            v, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return params, v, g
        finally:
            set_attn_kernel_mode("auto")

    p0, v0, (gp0, gx0) = run("xla")
    p1, v1, (gp1, gx1) = run("interpret")
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, p1))
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), atol=1e-5)
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gp0),
                               jax.tree_util.tree_leaves_with_path(gp1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=str(ka))
