"""KV-cached greedy decode: token parity with the buffer-path decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode
from deepsc_gan_tpu.evaluate.kv_decode import make_greedy_decode_kv
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.steps import create_train_state, make_train_step


@pytest.mark.parametrize("tie", [False, True])
def test_kv_decode_token_parity(tiny_cfg, tiny_batch, tie):
    """Same tokens as evaluate.greedy at f32, random AND trained params."""
    cfg = tiny_cfg.replace(tie_embeddings=tie, lr=2e-3)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    ref_decode = make_greedy_decode(model, cfg)
    kv_decode = make_greedy_decode_kv(model, cfg)

    for label, params in [("init", state.params)]:
        key = jax.random.PRNGKey(3)
        a = np.asarray(ref_decode(params, tiny_batch, key, 0.0, 0.1))
        b = np.asarray(kv_decode(params, tiny_batch, key, 0.0, 0.1))
        np.testing.assert_array_equal(a, b, err_msg=label)

    # after training (sharper logits, realistic END/PAD emissions)
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(7)
    for _ in range(60):
        key, sub = jax.random.split(key)
        state, _ = step(state, tiny_batch, tiny_batch, sub, 0.02)
    for n_std in (0.02, 0.5):
        a = np.asarray(ref_decode(state.params, tiny_batch,
                                  jax.random.PRNGKey(9), 0.0, n_std))
        b = np.asarray(kv_decode(state.params, tiny_batch,
                                 jax.random.PRNGKey(9), 0.0, n_std))
        np.testing.assert_array_equal(a, b, err_msg=f"trained n_std={n_std}")


def test_kv_decode_identity_ffn_mode(tiny_cfg, tiny_batch):
    cfg = tiny_cfg.replace(ffn_mode="identity")
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs)
    a = np.asarray(make_greedy_decode(model, cfg)(
        state.params, tiny_batch, jax.random.PRNGKey(1), 0.0, 0.1))
    b = np.asarray(make_greedy_decode_kv(model, cfg)(
        state.params, tiny_batch, jax.random.PRNGKey(1), 0.0, 0.1))
    np.testing.assert_array_equal(a, b)


def test_kv_decode_gan_variant_token_parity(tiny_cfg, tiny_batch):
    """The GAN transceiver serves through the same KV path as the vanilla
    (both take position_mode='step'): token parity with the buffer-path
    greedy decode on the gan variant."""
    cfg = tiny_cfg
    model = make_model(cfg, "gan")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               batch_size=cfg.bs, traingan=True)
    a = np.asarray(make_greedy_decode(model, cfg)(
        state.params, tiny_batch, jax.random.PRNGKey(5), 0.0, 0.1))
    b = np.asarray(make_greedy_decode_kv(model, cfg)(
        state.params, tiny_batch, jax.random.PRNGKey(5), 0.0, 0.1))
    np.testing.assert_array_equal(a, b)
