"""Tensor-parallel (vocab-sharded) training over a (dp, tp) mesh.

The model's parameters are dominated by three (22234 x 128) matrices
(encoder/decoder embeddings + final vocab projection); everything else is
tiny. The natural tensor-parallel split on TPU is therefore
Megatron-style VOCAB parallelism:

  - the final projection kernel W (D, V) is sharded on V over the `tp`
    mesh axis — each chip holds a (D, V/tp) shard;
  - the fused online-softmax CE computes per-shard partial (max, sumexp)
    and the gold logit only on the shard that owns the label, then
    combines with `jax.lax.pmax` / `psum` over `tp` — the ONLY
    cross-chip traffic is two (N,)-sized collectives per step (vs
    all-gathering (N, V) logits);
  - batch stays sharded over `dp`; gradients for replicated params are
    psum'd over dp (and over tp, where tp chips computed partial dW for
    their shard only).

Implemented with `shard_map` so the collectives are explicit and ride ICI.
The embeddings stay replicated (their lookup is a gather — cheap — and
sharding them would turn every lookup into a collective); only the
projection + CE, which dominate FLOPs and memory traffic, are split.

This is a NEW capability (the reference is single-device; SURVEY.md §2
"parallelism inventory: zero") — at reference scale it is for scale-out
headroom, and the same recipe carries to larger vocabularies/models.
"""

from __future__ import annotations


from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.steps import TrainState, _loss_kwargs, _shift_targets
from deepsc_gan_tpu.utils.config import Config

NEG = -1e30


def vocab_parallel_ce(hidden, W_shard, b_shard, labels, shard_offset,
                      tp_axis: str, mask):
    """Per-row CE with W/b sharded on the vocab axis inside shard_map.

    hidden: (N, D) replicated-over-tp; W_shard: (D, Vs); b_shard: (Vs,);
    labels: (N,) global ids; shard_offset: this shard's first vocab id.
    -> mean masked CE (replicated over tp)."""
    h32 = hidden.astype(jnp.float32)
    logits = h32 @ W_shard.astype(jnp.float32) + b_shard.astype(jnp.float32)

    # local max / sumexp -> global via pmax/psum over tp. The max is only
    # a numerical-stability shift (it cancels in lse), so it carries no
    # gradient — stop_gradient also sidesteps pmax's missing diff rule.
    local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    gmax = jax.lax.stop_gradient(jax.lax.pmax(local_max, tp_axis))
    local_sum = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1)
    gsum = jax.lax.psum(local_sum, tp_axis)
    lse = gmax + jnp.log(gsum)

    # gold logit: only the owning shard contributes
    local_label = labels - shard_offset
    vs = W_shard.shape[1]
    owned = (local_label >= 0) & (local_label < vs)
    safe = jnp.clip(local_label, 0, vs - 1)
    gold_local = jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0]
    gold = jax.lax.psum(jnp.where(owned, gold_local, 0.0), tp_axis)

    ce = lse - gold
    return jnp.mean(ce * mask)


def make_tp_train_step(model, cfg: Config, mesh: Mesh,
                       channel_kind: Optional[str] = None,
                       dp_axis: str = "dp", tp_axis: str = "tp") -> Callable:
    """Data- AND tensor-parallel train step over a (dp, tp) mesh.

    Sharding layout: batch on dp; the final projection's kernel/bias on
    tp (vocab axis); everything else replicated. Returns
    `step(state, inp, tar, key, n_std) -> (state, loss)`; use
    `shard_tp_state` to place the state before the first call."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    if cfg.tie_embeddings:
        raise ValueError(
            "vocab-parallel TP shards the untied final projection; with "
            "tie_embeddings the projection IS the decoder embedding "
            "(gather-heavy to shard) — use dp for tied models")
    if cfg.label_smoothing:
        raise ValueError("label_smoothing not yet folded into the "
                         "vocab-parallel CE; use dp or alpha=0")
    ntp = mesh.shape[tp_axis]
    if cfg.vocab_size % ntp:
        raise ValueError(f"vocab {cfg.vocab_size} % tp {ntp} != 0 — pad the "
                         "vocab (Config.vocab_size) to a multiple of tp")
    vs = cfg.vocab_size // ntp

    # param specs: final_layer sharded on vocab, rest replicated
    def param_spec(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "final_layer" in keys:
            if "kernel" in keys:
                return P(None, tp_axis)   # (D, V)
            return P(tp_axis)             # bias (V,)
        return P()

    def state_specs(state):
        pspecs = jax.tree_util.tree_map_with_path(param_spec, state.params)
        # optimizer state mirrors the param tree wherever shapes match
        def opt_spec(path, leaf):
            return _opt_leaf_spec(path, leaf)

        def _opt_leaf_spec(path, leaf):
            keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
            if "final_layer" in keys:
                if "kernel" in keys:
                    return P(None, tp_axis)
                return P(tp_axis)
            return P()

        ospecs = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
        # the EMA shadow (if enabled) mirrors the param tree's sharding
        especs = (jax.tree_util.tree_map_with_path(param_spec,
                                                   state.ema_params)
                  if state.ema_params is not None else None)
        return TrainState(step=P(), params=pspecs, opt_state=ospecs,
                          tx=state.tx, ema_params=especs,
                          ema_decay=state.ema_decay)

    def step_impl(state, inp, tar, key, n_std):
        # inside shard_map: inp/tar are the per-dp-shard batch; the
        # final-layer params are per-tp shards
        tp_idx = jax.lax.axis_index(tp_axis)
        shard_offset = tp_idx * vs
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # fold dp index into the key so each shard draws distinct noise
        key = jax.random.fold_in(key, jax.lax.axis_index(dp_axis))
        k_ch, k_do = jax.random.split(key)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)

        def loss_fn(params):
            tx_sym = model.apply({"params": params}, inp, enc_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do}, method="encode")
            y = model.apply({"params": params}, k_ch, tx_sym, p, 0.0, n_std,
                            kind, method="transmit")
            hidden = model.apply({"params": params}, tar_inp, y,
                                 combined_mask, dec_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do},
                                 method="decode_loss_ready")
            fl = params["semantic_decoder"]["final_layer"]
            n, l, d = hidden.shape
            mask = (tar_real != cfg.pad_idx).astype(jnp.float32)
            if lkw.get("extra_masked_ids"):
                for tid in lkw["extra_masked_ids"]:
                    mask = mask * (tar_real != tid).astype(jnp.float32)
            return vocab_parallel_ce(
                hidden.reshape(-1, d), fl["kernel"], fl["bias"],
                tar_real.reshape(-1).astype(jnp.int32), shard_offset,
                tp_axis, mask.reshape(-1))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # grad reduction: replicated params sum over BOTH axes; the
        # tp-sharded final layer sums over dp only (each tp shard owns its
        # slice). loss itself averages over dp.
        def reduce_grad(path, g):
            keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
            g = jax.lax.psum(g, dp_axis)
            if "final_layer" not in keys:
                g = jax.lax.psum(g, tp_axis)
            return g

        grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)
        # match the single-device mean-over-global-batch semantics
        grads = jax.tree.map(lambda g: g / mesh.shape[dp_axis], grads)
        loss = jax.lax.pmean(loss, dp_axis)
        return state.apply_gradients(grads), loss

    def make(state):
        sspec = state_specs(state)
        return jax.jit(shard_map(
            step_impl, mesh=mesh,
            in_specs=(sspec, P(dp_axis), P(dp_axis), P(), P()),
            out_specs=(sspec, P()),
        ))

    return make


def shard_tp_state(state: TrainState, mesh: Mesh,
                   dp_axis: str = "dp", tp_axis: str = "tp") -> TrainState:
    """Place a TrainState on the mesh: final-layer params (and their
    optimizer moments) sharded on the vocab axis, everything else
    replicated."""

    def put(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "final_layer" in keys and hasattr(leaf, "ndim") and leaf.ndim >= 1:
            spec = P(None, tp_axis) if leaf.ndim == 2 else P(tp_axis)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(put, state.params)
    opt_state = jax.tree_util.tree_map_with_path(put, state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    ema = (jax.tree_util.tree_map_with_path(put, state.ema_params)
           if state.ema_params is not None else None)
    return state.replace(step=step, params=params, opt_state=opt_state,
                         ema_params=ema)
