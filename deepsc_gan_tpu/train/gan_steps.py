"""GAN three-phase joint training step.

Behavioral spec from the reference `gan_train_step`
(`DeepSC-GAN/utlis/gan_train.py:8-50`): one forward of the GAN transceiver
(generator-produced perturbation, channel run twice), three losses —
    loss   = CE(tar_real, pred_r)                      (clean receiver)
    g_loss = ceiling - CE(tar_real, pred_p)            (generator: push CE up)
    d_loss = λ·CE(pred_r) + (1-λ)·CE(pred_p)           (robust receiver)
— and three selective updates from ONE shared Adam:
    phase 1: everything except the generator      <- loss
    phase 2: the generator only                   <- g_loss
    phase 3: everything except generator, semantic encoder and channel
             encoder (the receiver side)          <- d_loss

Quirk Q4 fixed: the reference freezes layers by name-string matching and a
hard-coded `trainable_variables[104:108]` slice for the generator
(gan_train.py:25-37). Here the phases are explicit parameter-tree
partitions selected by top-level module name. The reference applies the
SAME Adam optimizer in all three phases (shared slot variables for
parameters trained in more than one phase, shared iteration count) — that
exact semantics is reproduced by `selective_update`, which runs the shared
optimizer and then merges state/updates leaf-wise by the phase mask.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.steps import TrainState, _loss_kwargs, _shift_targets
from deepsc_gan_tpu.utils.config import Config

GENERATOR = "generator"
TX_SIDE = ("generator", "semantic_encoder", "channel_encoder")


def phase_mask(params, include: Optional[tuple] = None,
               exclude: Optional[tuple] = None):
    """Boolean pytree selecting top-level param groups."""

    def sel(name):
        if include is not None:
            return name in include
        return name not in (exclude or ())

    return {k: jax.tree.map(lambda _: sel(k), v) for k, v in params.items()}


def selective_update(state: TrainState, grads, mask) -> TrainState:
    """Apply `state.tx` to `grads` but only realize updates (and optimizer-
    state changes) for leaves where `mask` is True; masked-out leaves keep
    their params AND their optimizer moments untouched — matching TF's
    apply_gradients over a filtered variable list against one shared Adam."""
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(
        lambda u, m: jnp.where(m, u, jnp.zeros_like(u)), updates, mask)
    new_opt = _merge_opt_state(new_opt, state.opt_state, mask)
    return state.replace(
        step=state.step + 1,
        params=optax.apply_updates(state.params, updates),
        opt_state=new_opt,
    )


def _merge_opt_state(new_state, old_state, mask):
    """Merge optimizer states by the phase mask: for parameters OUTSIDE
    the phase, the Adam moments keep their OLD values (TF's
    apply_gradients over a filtered variable list never touches the
    excluded slots); scalar bookkeeping (count, schedule step) keeps the
    new value.

    Matching is EXPLICIT by optax state type — `ScaleByAdamState.mu/nu`
    are the only param-shaped trees merged — rather than structural
    guessing, so a coincidental structure match can never mis-merge. Any
    unrecognized state that carries param-shaped leaves raises: extend
    the match here before using such an optimizer for GAN phase
    training."""

    def merge(new_sub, old_sub):
        return jax.tree.map(
            lambda n, o, m: jnp.where(m, n, o), new_sub, old_sub, mask)

    def walk(new_sub, old_sub):
        if isinstance(new_sub, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=new_sub.count,
                mu=merge(new_sub.mu, old_sub.mu),
                nu=merge(new_sub.nu, old_sub.nu))
        if isinstance(new_sub, (tuple, list)) and not hasattr(new_sub,
                                                              "_fields"):
            items = [walk(n, o) for n, o in zip(new_sub, old_sub)]
            return type(new_sub)(items) if isinstance(new_sub, list) \
                else tuple(items)
        # other optax states: fine as long as they hold no per-parameter
        # arrays (EmptyState, ScaleByScheduleState count, ...)
        leaves = jax.tree.leaves(new_sub)
        if all(getattr(l, "ndim", 0) == 0 for l in leaves):
            return new_sub
        raise ValueError(
            f"GAN phase updates support adam-family optimizers; found "
            f"unhandled optax state with per-parameter slots: "
            f"{type(new_sub).__name__}")

    return walk(new_state, old_state)


def make_gan_train_step(model, cfg: Config,
                        channel_kind: Optional[str] = None,
                        jit: bool = True,
                        full_target: bool = False) -> Callable:
    """Returns `step(state, inp, tar, key, n_std)
    -> (state, (loss, g_loss, d_loss))`, jitted unless `jit=False`
    (parallel makers re-jit the raw step with explicit shardings).
    `full_target=True` scores the losses against the UN-shifted target —
    required for the gan_star variant, whose SD decoder outputs at MEMORY
    length (like every star training path, train/steps.py).

    As in the reference (gan_train.py:13-14) the input perturbation is a
    fresh unit-norm gaussian each step — but since traingan=True the
    generator output replaces it inside the forward; the random p is kept
    for parity of the RNG stream and for traingan=False experiments."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)

    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_shift = _shift_targets(tar)
        tar_real = tar if full_target else tar_shift
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        k_p, k_ch, k_do = jax.random.split(key, 3)
        # note: the global normalization cancels the n_std factor — the
        # perturbation is unit-norm regardless. Kept because the reference
        # does exactly this (gan_train.py:13-14); tuning n_std here
        # changes nothing by construction
        p = n_std * jax.random.normal(
            k_p, (inp.shape[0], cfg.seq_len, cfg.channel_dim), jnp.float32)
        p = p / jnp.linalg.norm(p)

        def losses(params):
            pred_p, pred_r, _, _ = model.apply(
                {"params": params}, inp, tar_inp, k_ch, p, cfg.gan_pnr_db,
                kind, n_std, enc_mask, combined_mask, dec_mask,
                deterministic=False, rngs={"dropout": k_do}, traingan=True)
            loss = loss_function(tar_real, pred_r, **lkw)
            ce_p = loss_function(tar_real, pred_p, **lkw)
            g_loss = cfg.g_loss_ceiling - ce_p
            d_loss = cfg.gan_lambda * loss + (1.0 - cfg.gan_lambda) * ce_p
            return loss, g_loss, d_loss

        loss_v, g_v, d_v = losses(state.params)

        # three backward passes over the same forward (XLA shares the
        # common forward subexpressions across them)
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
            # selective_update bypasses apply_gradients, so advance the
            # EMA shadow once per full 3-phase step here
            d = state.ema_decay
            state = state.replace(ema_params=jax.tree.map(
                lambda e, q: d * e + (1.0 - d) * q,
                state.ema_params, state.params))
        return state, (loss_v, g_v, d_v)

    return jax.jit(step) if jit else step


def make_gan_eval_step(model, cfg: Config,
                       channel_kind: Optional[str] = None,
                       full_target: bool = False) -> Callable:
    """FGM-style eval of the GAN model (reference `eval_step` in
    gan_train.py:53-83 and `eval_step_FGM` in eval.py:367-409): grad of the
    clean loss w.r.t. the clean received y_r -> perturbation -> re-forward.
    `full_target=True` for the star-codec gan_star variant (SD decodes at
    memory length). Returns jitted
    `step(state, inp, tar, key, pnr_db, n_std, epsilon)
    -> (clean_loss, attacked_loss, clean_logits, attacked_logits)`."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    from deepsc_gan_tpu.train.attacks import fgm_normalize

    @jax.jit
    def step(state: TrainState, inp, tar, key, pnr_db, n_std, epsilon):
        params = state.params
        tar_inp, tar_shift = _shift_targets(tar)
        tar_real = tar if full_target else tar_shift
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        k1, k2 = jax.random.split(key)
        p0 = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                       jnp.float32)

        # clean forward, split so the received y_r is an explicit input
        tx_sym = model.apply({"params": params}, inp, enc_mask,
                             deterministic=True, method="encode")
        y_r = model.apply({"params": params}, k1, tx_sym, p0, pnr_db, n_std,
                          kind, method="transmit")

        def loss_wrt_y(y):
            logits = model.apply({"params": params}, tar_inp, y,
                                 combined_mask, dec_mask, deterministic=True,
                                 method="decode")
            return loss_function(tar_real, logits, **lkw)

        clean_loss, g_y = jax.value_and_grad(loss_wrt_y)(y_r)
        clean_logits = model.apply({"params": params}, tar_inp, y_r,
                                   combined_mask, dec_mask,
                                   deterministic=True, method="decode")
        pert = fgm_normalize(g_y, epsilon)

        pred_p, pred_r, _, _ = model.apply(
            {"params": params}, inp, tar_inp, k2, pert, pnr_db, kind, n_std,
            enc_mask, combined_mask, dec_mask, deterministic=True,
            traingan=False)
        attacked_loss = loss_function(tar_real, pred_p, **lkw)
        return clean_loss, attacked_loss, clean_logits, pred_p

    return step
