"""Plain and FGM-adversarial train/eval steps.

Behavioral spec from the reference (`DeepSC-GAN/utlis/trainer.py:12-64`,
`utlis/eval.py:189-232`), re-designed as pure jitted functions over a
`TrainState`: teacher-forced forward -> reference-parity masked CE ->
Adam. The FGM step is the two-phase pattern of §3.3 in SURVEY.md:
forward #1, grad w.r.t. the received symbols y, FGM-normalize, forward #2
with the perturbation injected, update on the adversarial loss.

Each step takes an explicit PRNG `key`; channel noise and dropout keys are
split from it, so a fixed key gives a bit-reproducible step.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deepsc_gan_tpu.ops.losses import loss_function
from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.ops.schedule import make_optimizer
from deepsc_gan_tpu.utils.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # exponential moving average of params (None = disabled). A pytree
    # field so it rides through jit/scan carries untouched.
    ema_params: Optional[dict] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                               ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=ema,
        )


def eval_params(state: TrainState):
    """The parameter tree evaluation should use: the EMA shadow when
    enabled, else the live params."""
    return state.params if state.ema_params is None else state.ema_params


def create_train_state(model, cfg: Config, key,
                       tx: Optional[optax.GradientTransformation] = None,
                       batch_size: Optional[int] = None,
                       **init_kwargs) -> TrainState:
    """Initialize params with dummy batch shapes derived from the config.
    For the GAN transceiver pass `traingan=True` so the generator's params
    are created."""
    bs = batch_size or cfg.bs
    inp = jnp.zeros((bs, cfg.seq_len), jnp.int32)
    tar_inp = jnp.zeros((bs, cfg.seq_len - 1), jnp.int32)
    p = jnp.zeros((bs, cfg.seq_len, cfg.channel_dim), jnp.float32)
    k_init, k_ch = jax.random.split(key)

    # jit the init: eager init dispatches hundreds of small ops (minutes
    # over a tunneled TPU); jitted it is one program
    @jax.jit
    def _init(k_init, k_ch, inp, tar_inp, p):
        return model.init(
            {"params": k_init, "dropout": k_init}, inp, tar_inp, k_ch, p,
            0.0, deterministic=True, **init_kwargs)

    variables = _init(k_init, k_ch, inp, tar_inp, p)
    tx = tx or make_optimizer(cfg.lr, cfg.schedule, cfg.encoder_d_model,
                              cfg.warmup_steps, cfg.decay_steps)
    params = variables["params"]
    # jnp.copy, NOT identity: the shadow must be distinct buffers or
    # donated executions see the same buffer twice (f(donate(a), donate(a)))
    ema = (jax.tree.map(jnp.copy, params)
           if cfg.ema_decay > 0.0 else None)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx,
                      ema_params=ema, ema_decay=cfg.ema_decay)


def make_step_key(cfg: Config, seed: int):
    """Root PRNG key honoring cfg.rng_impl. "threefry" returns the legacy
    raw key (bit-compatible with rounds 1-2); other impls return a typed
    key array that carries its implementation through split/fold_in —
    "rbg" trades the splittable-stream guarantees for the hardware
    generator (the profiled production choice at compute-bound scale,
    utils/config.py:rng_impl)."""
    if cfg.rng_impl == "threefry":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=cfg.rng_impl)


def _shift_targets(tar):
    return tar[:, :-1], tar[:, 1:]


def _step_noise(cfg: Config, key, n_std):
    """Per-step channel noise std: the given n_std, or (when
    cfg.train_snr_random) a fresh draw SNR ~ U(lo, hi) dB mapped through
    n_std = 10^(-SNR/20) (models.channel.snr_to_noise). With
    cfg.train_snr_mix < 1 the uniform draw happens only with that
    probability, else the fixed n_std is kept — a low-SNR-anchored
    curriculum."""
    if not cfg.train_snr_random:
        return n_std
    k_u, k_b = jax.random.split(key)
    snr = jax.random.uniform(k_u, (), jnp.float32,
                             cfg.train_snr_lo, cfg.train_snr_hi)
    drawn = 10.0 ** (-snr / 20.0)
    if cfg.train_snr_mix >= 1.0:
        return drawn
    use = jax.random.bernoulli(k_b, cfg.train_snr_mix)
    return jnp.where(use, drawn, n_std)


def _loss_kwargs(cfg: Config):
    extra = (4, 5) if cfg.mask_extra_tokens else None
    return dict(pad_idx=cfg.pad_idx, extra_masked_ids=extra,
                label_smoothing=cfg.label_smoothing)


def _final_wb(params):
    """Final vocab-projection weights from the param tree (same top-level
    layout for every transceiver variant). With tied embeddings the
    projection is the transposed decoder embedding table plus a learned
    bias (models/transformer.py Decoder.setup); grads flow back into the
    table through the transpose."""
    dec = params["semantic_decoder"]
    if "final_layer" in dec:
        fl = dec["final_layer"]
        return fl["kernel"], fl["bias"]
    E = dec["embed"]["embedding"]["embedding"]  # (V, D)
    return E.T, dec["final_bias"]


def make_forward_loss(model, cfg: Config, kind: str, lkw: dict):
    """Teacher-forced forward -> masked CE. Uses the fused
    vocab-projection+CE path when cfg.fused_ce (staged forward, hidden
    states only), else the composed __call__ with materialized logits."""
    from deepsc_gan_tpu.ops.fused_ce import fused_ce_loss

    def forward_loss(params, inp, tar_inp, tar_real, k_ch, k_do, p, pnr_db,
                     n_std, enc_mask, combined_mask, dec_mask):
        if cfg.fused_ce:
            tx = model.apply({"params": params}, inp, enc_mask,
                             deterministic=False, rngs={"dropout": k_do},
                             method="encode")
            y = model.apply({"params": params}, k_ch, tx, p, pnr_db, n_std,
                            kind, method="transmit")
            hidden = model.apply({"params": params}, tar_inp, y,
                                 combined_mask, dec_mask,
                                 deterministic=False,
                                 rngs={"dropout": k_do},
                                 method="decode_loss_ready")
            W, bb = _final_wb(params)
            return fused_ce_loss(hidden, W, bb, tar_real,
                                 chunk=cfg.ce_chunk, **lkw)
        logits, *_ = model.apply(
            {"params": params}, inp, tar_inp, k_ch, p, pnr_db, kind, n_std,
            enc_mask, combined_mask, dec_mask, deterministic=False,
            rngs={"dropout": k_do})
        return loss_function(tar_real, logits, **lkw)

    return forward_loss


def make_train_step(model, cfg: Config,
                    channel_kind: Optional[str] = None,
                    full_target: bool = False,
                    donate: bool = False) -> Callable:
    """Plain teacher-forced step (reference `train_step_noattack`,
    trainer.py:12-27; PNR fixed 0, p passed through). `full_target=True`
    scores against the UN-shifted target — required for star decoders,
    whose output length equals the memory length (see eval_step_star,
    utlis/eval.py:334). `donate=True` donates the input state's buffers
    (params/opt-state updated in place on TPU — halves HBM traffic for the
    optimizer; the passed-in state must not be reused). Returns a jitted
    `step(state, inp, tar, key, n_std) -> (state, loss)`."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    forward_loss = make_forward_loss(model, cfg, kind, lkw)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        if full_target:
            tar_real = tar
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        k_ch, k_do, k_snr = jax.random.split(key, 3)
        n_std_t = _step_noise(cfg, k_snr, n_std)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)

        def loss_fn(params):
            return forward_loss(params, inp, tar_inp, tar_real, k_ch, k_do,
                                p, 0.0, n_std_t, enc_mask, combined_mask,
                                dec_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return step


def make_train_multi_step(model, cfg: Config,
                          channel_kind: Optional[str] = None,
                          full_target: bool = False,
                          donate: bool = True) -> Callable:
    """K sequential train steps fused into ONE dispatch via `lax.scan`.

    At the reference's model scale (~7M params, B=64, L=31) a single step
    computes in ~0.2ms on a v5e chip while host->device dispatch costs
    ~2ms — the training loop is latency-bound, not compute-bound. Scanning
    K steps on-device amortizes the dispatch to 1/K per step with
    BIT-IDENTICAL optimizer semantics (same sequential Adam updates as K
    single-step calls at the same keys).

    Returns jitted `multi_step(state, inps, tars, key, n_std)
    -> (state, losses[K])` where inps/tars are (K, B, L) stacked batches
    and per-step keys are derived by split."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    forward_loss = make_forward_loss(model, cfg, kind, lkw)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state: TrainState, inps, tars, key, n_std):
        def body(state, xs):
            inp, tar, k = xs
            tar_inp, tar_real = _shift_targets(tar)
            if full_target:
                tar_real = tar
            enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                             cfg.pad_idx)
            k_ch, k_do, k_snr = jax.random.split(k, 3)
            n_std_t = _step_noise(cfg, k_snr, n_std)
            p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                          jnp.float32)

            def loss_fn(params):
                return forward_loss(params, inp, tar_inp, tar_real, k_ch,
                                    k_do, p, 0.0, n_std_t, enc_mask,
                                    combined_mask, dec_mask)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        keys = jax.random.split(key, inps.shape[0])
        return jax.lax.scan(body, state, (inps, tars, keys))

    return multi_step


def make_train_attack_step(model, cfg: Config,
                           channel_kind: Optional[str] = None,
                           full_target: bool = False,
                           adv_weight: float = 1.0,
                           jit: bool = True) -> Callable:
    """FGM adversarial step (reference `train_attack_step`,
    trainer.py:30-64). `full_target=True` reproduces the reference's use of
    the UN-shifted target as `tar_real` (trainer.py:32) — only valid for
    star decoders whose output length equals the memory length.

    `adv_weight` mixes the update objective:
    w*adv_loss + (1-w)*clean_loss. The reference updates on the
    adversarial loss ONLY (w=1, trainer.py:54-62), which at small data
    scales collapses clean quality (RESULTS.md); w~0.5 is the standard
    robust-training remedy, offered as an extension.

    Returns `step(state, inp, tar, key, pnr_db, n_std, epsilon)
    -> (state, (clean_loss, adv_loss))`, jitted unless `jit=False`
    (parallel makers re-jit the raw step with explicit shardings)."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    from deepsc_gan_tpu.train.attacks import fgm_normalize

    def step(state: TrainState, inp, tar, key, pnr_db, n_std, epsilon):
        tar_inp, tar_shift = _shift_targets(tar)
        tar_real = tar if full_target else tar_shift
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        k_ch1, k_ch2, k_do1, k_do2 = jax.random.split(key, 4)
        p0 = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                       jnp.float32)

        # ---- phase 1: forward with given p, grad of loss w.r.t. received y
        def loss_wrt_y(y, params):
            logits = model.apply(
                {"params": params}, tar_inp, y, combined_mask, dec_mask,
                deterministic=False, rngs={"dropout": k_do1},
                method="decode")
            return loss_function(tar_real, logits, **lkw)

        tx_sym = model.apply({"params": state.params}, inp, enc_mask,
                             deterministic=False, rngs={"dropout": k_do1},
                             method="encode")
        y1 = model.apply({"params": state.params}, k_ch1, tx_sym, p0, pnr_db,
                         n_std, kind, method="transmit")
        clean_loss, g_y = jax.value_and_grad(loss_wrt_y)(y1, state.params)
        r = fgm_normalize(g_y, epsilon)

        # ---- phase 2: forward with p = r; update on the (mixed) objective
        def adv_loss_fn(params):
            logits, *_ = model.apply(
                {"params": params}, inp, tar_inp, k_ch2, r, pnr_db, kind,
                n_std, enc_mask, combined_mask, dec_mask,
                deterministic=False, rngs={"dropout": k_do2})
            adv = loss_function(tar_real, logits, **lkw)
            if adv_weight >= 1.0:
                return adv, adv  # reference behavior: adversarial only
            logits_c, *_ = model.apply(
                {"params": params}, inp, tar_inp, k_ch2, p0, pnr_db, kind,
                n_std, enc_mask, combined_mask, dec_mask,
                deterministic=False, rngs={"dropout": k_do2})
            clean = loss_function(tar_real, logits_c, **lkw)
            return adv_weight * adv + (1.0 - adv_weight) * clean, adv

        (_, adv_loss), grads = jax.value_and_grad(
            adv_loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), (clean_loss, adv_loss)

    return jax.jit(step) if jit else step


def make_eval_step_pgd(model, cfg: Config,
                       channel_kind: Optional[str] = None,
                       full_target: bool = False,
                       iters: int = 10) -> Callable:
    """PGD-style eval (reference `eval_step_normal_pgd`,
    utlis/eval.py:235-318): FGM direction from the gradient w.r.t. the
    received y, then a bisection search on the attack strength
    eps in [0, 1] for the smallest eps whose attacked loss exceeds the
    clean loss — here as a `lax.while_loop`-free, fixed-trip
    `lax.fori_loop` bisection (train.attacks.pgd_bisection). The
    reference re-runs the full attacked forward per bisection iteration;
    so does this, inside one jitted program.

    Note the reference's PGD perturbation enters the channel pre-scaled by
    sqrt(size) (eval.py:277-280), i.e. through the same `p` convention as
    awgn(). Returns jitted
    `step(state, inp, tar, key, pnr_db, n_std, epsilon)
    -> (clean_loss, attacked_loss, clean_logits, attacked_logits,
    eps_star)` — logits in the same positions as make_eval_step so BLEU
    tables score all eval modes uniformly."""
    kind = channel_kind or cfg.channel
    lkw = _loss_kwargs(cfg)
    from deepsc_gan_tpu.train.attacks import fgm_normalize, pgd_bisection

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

        tx_sym = model.apply({"params": params}, inp, enc_mask,
                             deterministic=True, method="encode")
        y0 = model.apply({"params": params}, k1, tx_sym, p0, pnr_db, n_std,
                         kind, method="transmit")

        def decode_logits(y):
            return model.apply({"params": params}, tar_inp, y,
                               combined_mask, dec_mask, deterministic=True,
                               method="decode")

        def loss_wrt_y(y):
            return loss_function(tar_real, decode_logits(y), **lkw)

        clean_loss, g = jax.value_and_grad(loss_wrt_y)(y0)
        direction = fgm_normalize(g, epsilon)
        clean_logits = decode_logits(y0)

        def attacked_forward(pert):
            y = model.apply({"params": params}, k2, tx_sym, pert, pnr_db,
                            n_std, kind, method="transmit")
            return decode_logits(y)

        def attacked_loss(pert):
            return loss_function(tar_real, attacked_forward(pert), **lkw)

        eps_star, loss_m = pgd_bisection(attacked_loss, direction,
                                         clean_loss, iters=iters)
        attacked_logits = attacked_forward(eps_star * direction)
        return clean_loss, loss_m, clean_logits, attacked_logits, eps_star

    return step


def make_eval_step(model, cfg: Config, channel_kind: Optional[str] = None,
                   attack_target: str = "tx",
                   full_target: bool = False) -> Callable:
    """Teacher-forced eval with an FGM attack (reference
    `eval_step_normal` / `eval_step_star`, utlis/eval.py:189-232,321-365).
    `attack_target` picks the intermediate differentiated against: "tx"
    (the reference's channel_enc_output) or "y" (received). For non-AWGN
    channels the reference computes the attack gradient through an AWGN
    pass (eval.py:204-211) — reproduced. Returns jitted
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
        k1, k2, k3 = jax.random.split(key, 3)
        p0 = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                       jnp.float32)

        def forward(k, p, ch):
            logits, tx_sym, y, _ = model.apply(
                {"params": params}, inp, tar_inp, k, p, pnr_db, ch, n_std,
                enc_mask, combined_mask, dec_mask, deterministic=True)
            return logits, tx_sym, y

        clean_logits, _, _ = forward(k1, p0, kind)
        clean_loss = loss_function(tar_real, clean_logits, **lkw)

        # attack gradient — always through an AWGN pass (reference
        # eval.py:204-213: for fading channels the gradient is taken from a
        # SEPARATE AWGN forward with its own noise draw; for AWGN it comes
        # from the SAME tape as the clean forward, i.e. the same noise
        # realization — so reuse k1 there)
        k_grad = k1 if kind == "AWGN" else k2

        def loss_wrt_tx(tx_sym):
            y = model.apply({"params": params}, k_grad, tx_sym, p0, pnr_db,
                            n_std, "AWGN", method="transmit")
            logits = model.apply({"params": params}, tar_inp, y,
                                 combined_mask, dec_mask, deterministic=True,
                                 method="decode")
            return loss_function(tar_real, logits, **lkw)

        def loss_wrt_y(y):
            logits = model.apply({"params": params}, tar_inp, y,
                                 combined_mask, dec_mask, deterministic=True,
                                 method="decode")
            return loss_function(tar_real, logits, **lkw)

        tx_sym = model.apply({"params": params}, inp, enc_mask,
                             deterministic=True, method="encode")
        if attack_target == "tx":
            g = jax.grad(loss_wrt_tx)(tx_sym)
        else:
            y_awgn = model.apply({"params": params}, k_grad, tx_sym, p0,
                                 pnr_db, n_std, "AWGN", method="transmit")
            g = jax.grad(loss_wrt_y)(y_awgn)
        pert = fgm_normalize(g, epsilon)

        attacked_logits, _, _ = forward(k3, pert, kind)
        attacked_loss = loss_function(tar_real, attacked_logits, **lkw)
        return clean_loss, attacked_loss, clean_logits, attacked_logits

    return step
