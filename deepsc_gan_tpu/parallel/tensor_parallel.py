"""Tensor-parallel (vocab-sharded) training over a (dp, tp) mesh.

The model's parameters are dominated by three (22234 x 128) matrices
(encoder/decoder embeddings + final vocab projection); everything else is
tiny. The natural tensor-parallel split on TPU is therefore
Megatron-style VOCAB parallelism:

  - the final projection weights are sharded on the vocab axis over `tp`:
    the untied `final_layer` kernel (D, V) column-wise, or — with
    `tie_embeddings` — the decoder embedding table (V, D) row-wise (its
    transpose IS the projection) plus the (V,) output bias;
  - the CE computes per-shard partial (max, sumexp), the gold logit on
    the shard that owns the label, and (for label smoothing) the partial
    vocab-sum, combining with `pmax`/`psum` over `tp` — the only
    cross-chip traffic is a few (N,)-sized collectives per step, vs
    all-gathering (N, V) logits;
  - batch stays sharded over `dp`.

Architecture: the FORWARD (encoder, channel, decoder layers — including
the tied-table embedding lookup) is the ordinary single-device program
jitted under GSPMD with the vocab-owning params sharded; XLA partitions
it and inserts the collectives. Only the projection+CE — the one op where
GSPMD's default partition would materialize or gather (N, V) logits — is
an explicit `shard_map` over the full (dp, tp) mesh with hand-placed
collectives riding ICI. Because the forward is literally the same traced
program at the same global PRNG key, the (dp, tp) step is numerically
equivalent to the dp-only GSPMD step (and to the single-device step) to
reduction-order tolerance — tested in tests/test_tensor_parallel.py.

This is a NEW capability (the reference is single-device; SURVEY.md §2
"parallelism inventory: zero") — at reference scale it is for scale-out
headroom, and the same recipe carries to larger vocabularies/models.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.steps import (
    TrainState,
    _final_wb,
    _loss_kwargs,
    _shift_targets,
    _step_noise,
)
from deepsc_gan_tpu.utils.config import Config

NEG = -1e30


def vocab_parallel_ce_rows(hidden, W_shard, b_shard, labels, shard_offset,
                           tp_axis: str, label_smoothing: float = 0.0,
                           vocab_total: Optional[int] = None):
    """Per-row CE with W/b sharded on the vocab axis inside shard_map.

    hidden: (N, D) replicated-over-tp; W_shard: (D, Vs); b_shard: (Vs,);
    labels: (N,) global ids; shard_offset: this shard's first vocab id.
    -> per-row CE (N,), replicated over tp. With label_smoothing the
    fused-path convention applies: ce += alpha*(gold - mean_v logits)
    (ops/fused_ce.py) — the vocab mean needs `vocab_total`."""
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
    if label_smoothing:
        if vocab_total is None:
            raise ValueError("label_smoothing needs vocab_total")
        mean_logits = jax.lax.psum(jnp.sum(logits, axis=-1),
                                   tp_axis) / vocab_total
        ce = ce + label_smoothing * (gold - mean_logits)
    return ce


def vocab_parallel_ce(hidden, W_shard, b_shard, labels, shard_offset,
                      tp_axis: str, mask, label_smoothing: float = 0.0,
                      vocab_total: Optional[int] = None):
    """Mean masked CE over the LOCAL rows (replicated over tp) — the
    shard_map building block; see vocab_parallel_ce_rows."""
    ce = vocab_parallel_ce_rows(hidden, W_shard, b_shard, labels,
                                shard_offset, tp_axis, label_smoothing,
                                vocab_total)
    return jnp.mean(ce * mask)


def _vocab_param_spec(cfg: Config, tp_axis: str):
    """Path-rule: which params are sharded on the vocab axis.

    Untied: semantic_decoder.final_layer {kernel (D,V) -> P(None, tp),
    bias (V,) -> P(tp)}. Tied: the DECODER embedding table (V, D) ->
    P(tp, None) and final_bias (V,) -> P(tp). The encoder table (and the
    tied table's gather-lookup) stay GSPMD-managed."""

    def spec(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "final_layer" in keys:
            return P(None, tp_axis) if "kernel" in keys else P(tp_axis)
        if "final_bias" in keys:
            return P(tp_axis)
        if (cfg.tie_embeddings and "semantic_decoder" in keys
                and "embedding" in keys):
            return P(tp_axis, None)
        return P()

    return spec


def _build_ce_mapped(cfg: Config, mesh: Mesh, dp_axis: str, tp_axis: str,
                     lkw: dict):
    """The explicit-collective CE: hidden rows sharded over dp, projection
    weights over tp; returns the GLOBAL mean masked CE (the reference's
    mean-over-all-positions semantics, ops/losses.loss_function).
    Validates the mesh/config divisibility contracts shared by every tp
    step."""
    ntp = mesh.shape[tp_axis]
    if cfg.vocab_size % ntp:
        raise ValueError(f"vocab {cfg.vocab_size} % tp {ntp} != 0 — pad the "
                         "vocab (Config.vocab_size) to a multiple of tp")
    if cfg.bs % mesh.shape[dp_axis]:
        raise ValueError(f"batch {cfg.bs} % dp {mesh.shape[dp_axis]} != 0")
    vs = cfg.vocab_size // ntp
    alpha = lkw.get("label_smoothing") or 0.0
    ndp = mesh.shape[dp_axis]

    def ce_shard(hidden, W, b, labels, mask):
        # mean over ALL global rows (reference mean-over-all-positions
        # semantics) — denominator from the ACTUAL operand shape, not
        # cfg.bs, so callers with a different batch shape aren't silently
        # mis-scaled (hidden is the local dp shard of the flat rows)
        n_global = hidden.shape[0] * ndp
        off = jax.lax.axis_index(tp_axis) * vs
        ce = vocab_parallel_ce_rows(hidden, W, b, labels, off, tp_axis,
                                    alpha, cfg.vocab_size)
        return jax.lax.psum(jnp.sum(ce * mask), dp_axis) / n_global

    return shard_map(
        ce_shard, mesh=mesh,
        in_specs=(P(dp_axis), P(None, tp_axis), P(tp_axis), P(dp_axis),
                  P(dp_axis)),
        out_specs=P(),
        check_vma=False)


def _make_hidden_loss(model, cfg: Config, lkw: dict, ce_mapped):
    """Loss from a received channel output `y`: decode to hidden states
    (GSPMD region), then the vocab-parallel projection+CE. Differentiable
    in both `params` and `y` — the FGM attack's grad-wrt-y crosses the
    shard_map CE via its transpose."""

    def hidden_loss(params, tar_inp, y, combined_mask, dec_mask, k_do,
                    tar_real):
        hidden = model.apply({"params": params}, tar_inp, y, combined_mask,
                             dec_mask, deterministic=False,
                             rngs={"dropout": k_do},
                             method="decode_loss_ready")
        W, bb = _final_wb(params)
        d = hidden.shape[-1]
        mask = (tar_real != cfg.pad_idx).astype(jnp.float32)
        for tid in (lkw.get("extra_masked_ids") or ()):
            mask = mask * (tar_real != tid).astype(jnp.float32)
        return ce_mapped(hidden.reshape(-1, d).astype(jnp.float32), W, bb,
                         tar_real.reshape(-1).astype(jnp.int32),
                         mask.reshape(-1))

    return hidden_loss


def make_tp_train_step(model, cfg: Config, mesh: Mesh,
                       channel_kind: Optional[str] = None,
                       full_target: bool = False,
                       dp_axis: str = "dp", tp_axis: str = "tp") -> Callable:
    """Data- AND tensor-parallel train step over a (dp, tp) mesh.

    Supports the full flagship recipe — tied embeddings and label
    smoothing included (round-2 gates lifted). `full_target=True` scores
    against the UN-shifted target — required for star decoders, whose
    output length equals the memory length (train/steps.py semantics).
    Returns a curried maker:
    `make_tp_train_step(model, cfg, mesh)(state)` -> jitted
    `step(state, inp, tar, key, n_std) -> (state, loss)`; use
    `shard_tp_state` to place the state before the first call."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    spec_rule = _vocab_param_spec(cfg, tp_axis)
    ce_mapped = _build_ce_mapped(cfg, mesh, dp_axis, tp_axis, lkw)
    hidden_loss = _make_hidden_loss(model, cfg, lkw, ce_mapped)

    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_shift = _shift_targets(tar)
        tar_real = tar if full_target else tar_shift
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical key split to the dp-only GSPMD step
        # (parallel/sharding.py:make_parallel_train_step) so the two are
        # numerically equivalent at the same key
        k_ch, k_do, k_snr = jax.random.split(key, 3)
        n_std_t = _step_noise(cfg, k_snr, n_std)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)

        def loss_fn(params):
            # GSPMD region: the ordinary staged forward — with tied
            # embeddings the row-sharded table's lookup is partitioned by
            # XLA automatically
            tx_sym = model.apply({"params": params}, inp, enc_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do}, method="encode")
            y = model.apply({"params": params}, k_ch, tx_sym, p, 0.0,
                            n_std_t, kind, method="transmit")
            return hidden_loss(params, tar_inp, y, combined_mask, dec_mask,
                               k_do, tar_real)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def make(state):
        sshard = _tp_state_shardings(mesh, spec_rule, state)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(dp_axis))
        return jax.jit(step,
                       in_shardings=(sshard, data, data, repl, repl),
                       out_shardings=(sshard, repl))

    return make


def _tp_state_shardings(mesh: Mesh, spec_rule, state) -> TrainState:
    """NamedSharding tree for a TrainState under the vocab-tp layout."""

    def nsh(path, leaf):
        return NamedSharding(mesh, spec_rule(path, leaf))

    pspecs = jax.tree_util.tree_map_with_path(nsh, state.params)
    ospecs = jax.tree_util.tree_map_with_path(nsh, state.opt_state)
    especs = (jax.tree_util.tree_map_with_path(nsh, state.ema_params)
              if state.ema_params is not None else None)
    repl = NamedSharding(mesh, P())
    return TrainState(step=repl, params=pspecs, opt_state=ospecs,
                      tx=state.tx, ema_params=especs,
                      ema_decay=state.ema_decay)


def make_tp_attack_step(model, cfg: Config, mesh: Mesh,
                        channel_kind: Optional[str] = None,
                        full_target: bool = False,
                        adv_weight: float = 1.0,
                        dp_axis: str = "dp",
                        tp_axis: str = "tp") -> Callable:
    """Data+tensor-parallel FGM adversarial step (the reference's core
    robust-training loop, `train_attack_step` utlis/trainer.py:30-64) over
    a (dp, tp) mesh.

    Both FGM phases use the staged forward with the vocab-parallel
    projection+CE: phase 1's grad-wrt-the-received-y differentiates
    THROUGH the shard_map CE (its transpose re-uses the same collectives),
    phase 2 updates params on the (mixed) adversarial objective exactly
    like train.steps.make_train_attack_step — numerically equivalent to
    the single-device step at dropout=0 and the same key
    (tests/test_tensor_parallel.py). Returns a curried maker:
    `make_tp_attack_step(...)(state)` -> jitted
    `step(state, inp, tar, key, pnr_db, n_std, epsilon)
    -> (state, (clean_loss, adv_loss))`. `full_target=True` scores the
    UN-shifted target (star decoders, train/steps.py semantics)."""
    from deepsc_gan_tpu.train.attacks import fgm_normalize

    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    spec_rule = _vocab_param_spec(cfg, tp_axis)
    ce_mapped = _build_ce_mapped(cfg, mesh, dp_axis, tp_axis, lkw)
    hidden_loss = _make_hidden_loss(model, cfg, lkw, ce_mapped)

    def step(state: TrainState, inp, tar, key, pnr_db, n_std, epsilon):
        tar_inp, tar_shift = _shift_targets(tar)
        tar_real = tar if full_target else tar_shift
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # same key split as the single-device attack step (train/steps.py)
        k_ch1, k_ch2, k_do1, k_do2 = jax.random.split(key, 4)
        p0 = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                       jnp.float32)

        def encode_transmit(params, k_ch, k_do, p):
            tx_sym = model.apply({"params": params}, inp, enc_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do}, method="encode")
            return model.apply({"params": params}, k_ch, tx_sym, p, pnr_db,
                               n_std, kind, method="transmit")

        # ---- phase 1: forward with p=0, grad of loss w.r.t. received y
        y1 = encode_transmit(state.params, k_ch1, k_do1, p0)
        clean_loss, g_y = jax.value_and_grad(
            lambda y: hidden_loss(state.params, tar_inp, y, combined_mask,
                                  dec_mask, k_do1, tar_real))(y1)
        r = fgm_normalize(g_y, epsilon)

        # ---- phase 2: forward with p=r; update on the (mixed) objective
        def adv_loss_fn(params):
            y2 = encode_transmit(params, k_ch2, k_do2, r)
            adv = hidden_loss(params, tar_inp, y2, combined_mask, dec_mask,
                              k_do2, tar_real)
            if adv_weight >= 1.0:
                return adv, adv  # reference behavior: adversarial only
            y2c = encode_transmit(params, k_ch2, k_do2, p0)
            clean = hidden_loss(params, tar_inp, y2c, combined_mask,
                                dec_mask, k_do2, tar_real)
            return adv_weight * adv + (1.0 - adv_weight) * clean, adv

        (_, adv_loss), grads = jax.value_and_grad(
            adv_loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), (clean_loss, adv_loss)

    def make(state):
        sshard = _tp_state_shardings(mesh, spec_rule, state)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(dp_axis))
        return jax.jit(step,
                       in_shardings=(sshard, data, data, repl, repl, repl,
                                     repl),
                       out_shardings=(sshard, (repl, repl)))

    return make


def make_tp_gan_step(model, cfg: Config, mesh: Mesh,
                     channel_kind: Optional[str] = None,
                     dp_axis: str = "dp", tp_axis: str = "tp",
                     full_target: bool = False) -> Callable:
    """Data+tensor-parallel GAN 3-phase train step (the reference's
    headline training mode, `gan_train_step` utlis/gan_train.py:8-50) over
    a (dp, tp) mesh — closes the tp column of the mode×parallelism matrix.

    All three losses cross the vocab-parallel projection+CE (shard_map
    with pmax/psum over tp); the three backward passes each differentiate
    through its transpose, exactly like the attack step's grad-wrt-y
    (make_tp_attack_step). The 3-phase selective updates
    (train.gan_steps.selective_update — shared-Adam filtered-apply
    semantics) are elementwise over the param tree, so GSPMD applies them
    shard-local. Numerically equivalent to the single-device
    make_gan_train_step at dropout=0 and the same key
    (tests/test_tensor_parallel.py). Returns a curried maker:
    `make_tp_gan_step(model, cfg, mesh)(state)` -> jitted
    `step(state, inp, tar, key, n_std) -> (state, (loss, g_loss, d_loss))`."""
    from deepsc_gan_tpu.train.gan_steps import (
        GENERATOR,
        TX_SIDE,
        phase_mask,
        selective_update,
    )

    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    spec_rule = _vocab_param_spec(cfg, tp_axis)
    ce_mapped = _build_ce_mapped(cfg, mesh, dp_axis, tp_axis, lkw)
    hidden_loss = _make_hidden_loss(model, cfg, lkw, ce_mapped)

    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_shift = _shift_targets(tar)
        # full_target: gan_star's SD decodes at MEMORY length
        tar_real = tar if full_target else tar_shift
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical key split to the single-device GAN step
        # (train/gan_steps.py): k_p feeds the unused random perturbation
        # (traingan=True replaces it with G(tx)), so it is split and
        # discarded here to keep k_ch/k_do on the same stream
        _k_p, k_ch, k_do = jax.random.split(key, 3)
        key_p, key_r = jax.random.split(k_ch)  # TransceiverGAN.__call__

        def losses(params):
            tx_sym = model.apply({"params": params}, inp, enc_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do}, method="encode")
            p_gen = model.apply({"params": params}, tx_sym,
                                method="generate_perturbation")
            y_p = model.apply({"params": params}, key_p, tx_sym, p_gen,
                              cfg.gan_pnr_db, n_std, kind, method="transmit")
            y_r = model.apply({"params": params}, key_r, tx_sym,
                              jnp.zeros_like(tx_sym), cfg.gan_pnr_db, n_std,
                              kind, method="transmit")
            loss = hidden_loss(params, tar_inp, y_r, combined_mask,
                               dec_mask, k_do, tar_real)
            ce_p = hidden_loss(params, tar_inp, y_p, combined_mask,
                               dec_mask, k_do, tar_real)
            g_loss = cfg.g_loss_ceiling - ce_p
            d_loss = cfg.gan_lambda * loss + (1.0 - cfg.gan_lambda) * ce_p
            return loss, g_loss, d_loss

        loss_v, g_v, d_v = losses(state.params)
        g_codec = jax.grad(lambda q: losses(q)[0])(state.params)
        g_gen = jax.grad(lambda q: losses(q)[1])(state.params)
        g_disc = jax.grad(lambda q: losses(q)[2])(state.params)

        state = selective_update(
            state, g_codec, phase_mask(state.params, exclude=(GENERATOR,)))
        state = selective_update(
            state, g_gen, phase_mask(state.params, include=(GENERATOR,)))
        state = selective_update(
            state, g_disc, phase_mask(state.params, exclude=TX_SIDE))
        if state.ema_params is not None:
            d = state.ema_decay
            state = state.replace(ema_params=jax.tree.map(
                lambda e, q: d * e + (1.0 - d) * q,
                state.ema_params, state.params))
        return state, (loss_v, g_v, d_v)

    def make(state):
        sshard = _tp_state_shardings(mesh, spec_rule, state)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(dp_axis))
        return jax.jit(step,
                       in_shardings=(sshard, data, data, repl, repl),
                       out_shardings=(sshard, (repl, repl, repl)))

    return make


def make_tp_mine_step(model, mine, cfg: Config, mesh: Mesh,
                      channel_kind: Optional[str] = None,
                      dp_axis: str = "dp", tp_axis: str = "tp") -> Callable:
    """Data+tensor-parallel MINE joint train step (quirk Q6 capability,
    train/mine_steps.py) over a (dp, tp) mesh.

    The transceiver CE runs vocab-parallel (shard_map CE); the MINE
    statistics net is tiny and stays replicated — its inputs (tx, y) are
    dp-sharded, and the marginal-sample batch permutation crosses dp
    shards via the collective XLA inserts (same GSPMD story as
    parallel.sharding.make_parallel_mine_step). Returns a curried maker:
    `make_tp_mine_step(model, mine, cfg, mesh)(state)` -> jitted
    `step(state, mine_state, inp, tar, key, n_std)
    -> (state, mine_state, (loss, mi))`; pass a replicated `mine_state`
    (parallel.sharding.replicate)."""
    from deepsc_gan_tpu.models.mine import mutual_information, sample_batch

    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    lam = cfg.mine_lambda
    spec_rule = _vocab_param_spec(cfg, tp_axis)
    ce_mapped = _build_ce_mapped(cfg, mesh, dp_axis, tp_axis, lkw)
    hidden_loss = _make_hidden_loss(model, cfg, lkw, ce_mapped)

    def step(state: TrainState, mine_state, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical key split to the single-device MINE step
        k_ch, k_do, k_perm = jax.random.split(key, 3)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)

        def net_loss(params, mine_params):
            tx_sym = model.apply({"params": params}, inp, enc_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do}, method="encode")
            y = model.apply({"params": params}, k_ch, tx_sym, p, 0.0,
                            n_std, kind, method="transmit")
            ce = hidden_loss(params, tar_inp, y, combined_mask, dec_mask,
                             k_do, tar_real)
            xm, ym = sample_batch(k_perm, tx_sym, y)
            t_joint = mine.apply({"params": mine_params}, tx_sym, y)
            t_marg = mine.apply({"params": mine_params}, xm, ym)
            mi = mutual_information(t_joint, t_marg)
            return ce - lam * mi, (ce, mi)

        (_, (ce, mi)), grads = jax.value_and_grad(
            net_loss, argnums=0, has_aux=True)(state.params,
                                               mine_state.params)
        state = state.apply_gradients(grads)

        def mine_obj(mine_params):
            return -net_loss(state.params, mine_params)[1][1]

        g_mine = jax.grad(mine_obj)(mine_state.params)
        upd, new_opt = mine_state.tx.update(g_mine, mine_state.opt_state,
                                            mine_state.params)
        mine_state = mine_state.replace(
            params=optax.apply_updates(mine_state.params, upd),
            opt_state=new_opt)
        return state, mine_state, (ce, mi)

    def make(state):
        sshard = _tp_state_shardings(mesh, spec_rule, state)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(dp_axis))
        return jax.jit(step,
                       in_shardings=(sshard, repl, data, data, repl, repl),
                       out_shardings=(sshard, repl, (repl, repl)))

    return make


def shard_tp_state(state: TrainState, mesh: Mesh, cfg: Optional[Config] = None,
                   dp_axis: str = "dp", tp_axis: str = "tp") -> TrainState:
    """Place a TrainState on the mesh: vocab-owning params (and their
    optimizer moments / EMA shadows) sharded on the tp axis per
    `_vocab_param_spec`, everything else replicated. `cfg` is needed to
    recognize the tied-embedding layout; without it only the untied
    final_layer is sharded (back-compatible)."""
    rule = _vocab_param_spec(
        cfg if cfg is not None else Config(tie_embeddings=False), tp_axis)

    def put(path, leaf):
        spec = rule(path, leaf)
        if spec != P() and getattr(leaf, "ndim", 0) < len(spec):
            spec = P()  # scalar bookkeeping leaf that path-matched
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(put, state.params)
    opt_state = jax.tree_util.tree_map_with_path(put, state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    ema = (jax.tree_util.tree_map_with_path(put, state.ema_params)
           if state.ema_params is not None else None)
    return state.replace(step=step, params=params, opt_state=opt_state,
                         ema_params=ema)
