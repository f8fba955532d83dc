"""MINE joint training step (`--train-with-mine`).

The reference flags this capability (`utlis/parameters.py:24-25`) but its
implementation lives in the upstream DeepSC repo (quirk Q6, SURVEY.md §7).
This is the standard DeepSC phase-2 recipe implemented fresh:

  - the MINE statistics network T maximizes the DV bound
    MI(tx; y) >= E[T(tx,y)] - log E[e^T(tx, y_shuffled)];
  - the transceiver loss gains `- mine_lambda * MI` so the codec learns
    symbols that preserve mutual information across the channel.

Both networks update from one fused jitted step.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deepsc_gan_tpu.models.mine import MINE, mutual_information, sample_batch
from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.steps import TrainState, _loss_kwargs, _shift_targets
from deepsc_gan_tpu.utils.config import Config


class MineState(struct.PyTreeNode):
    params: dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_mine_state(cfg: Config, key, lr: float = 1e-3,
                      batch_size: Optional[int] = None) -> Tuple[MINE, MineState]:
    mine = MINE()
    bs = batch_size or cfg.bs
    x = jnp.zeros((bs, cfg.seq_len, cfg.channel_dim), jnp.float32)
    params = mine.init(key, x, x)["params"]
    # gradient clipping is essential: the DV bound's exp(T) term makes raw
    # Adam diverge (T grows unbounded on the marginal samples)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    return mine, MineState(params=params, opt_state=tx.init(params), tx=tx)


def make_mine_train_step(model, mine: MINE, cfg: Config,
                         channel_kind: Optional[str] = None,
                         jit: bool = True) -> Callable:
    """Returns `step(state, mine_state, inp, tar, key, n_std)
    -> (state, mine_state, (loss, mi))`, jitted unless `jit=False`
    (parallel makers re-jit the raw step with explicit shardings)."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    lam = cfg.mine_lambda

    def step(state: TrainState, mine_state: MineState, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        k_ch, k_do, k_perm = jax.random.split(key, 3)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)

        def net_loss(params, mine_params):
            logits, tx_sym, y, _ = model.apply(
                {"params": params}, inp, tar_inp, k_ch, p, 0.0, kind, n_std,
                enc_mask, combined_mask, dec_mask, deterministic=False,
                rngs={"dropout": k_do})
            ce = loss_function(tar_real, logits, **lkw)
            xm, ym = sample_batch(k_perm, tx_sym, y)
            t_joint = mine.apply({"params": mine_params}, tx_sym, y)
            t_marg = mine.apply({"params": mine_params}, xm, ym)
            mi = mutual_information(t_joint, t_marg)
            return ce - lam * mi, (ce, mi)

        # transceiver update (MINE params held fixed)
        (_, (ce, mi)), grads = jax.value_and_grad(
            net_loss, argnums=0, has_aux=True)(state.params,
                                               mine_state.params)
        state = state.apply_gradients(grads)

        # MINE update: maximize the bound (minimize -MI)
        def mine_obj(mine_params):
            return -net_loss(state.params, mine_params)[1][1]

        g_mine = jax.grad(mine_obj)(mine_state.params)
        upd, new_opt = mine_state.tx.update(g_mine, mine_state.opt_state,
                                            mine_state.params)
        mine_state = mine_state.replace(
            params=optax.apply_updates(mine_state.params, upd),
            opt_state=new_opt)
        return state, mine_state, (ce, mi)

    return jax.jit(step) if jit else step
