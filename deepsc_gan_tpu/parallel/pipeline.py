"""Pipeline-parallel (GPipe) training over a ("pp", "dp") mesh.

The reference is single-device (SURVEY.md §2: zero distributed code); dp
and vocab-tp layers exist in parallel/sharding.py / tensor_parallel.py.
This module adds the third classic axis: INTER-LAYER pipeline parallelism,
so the framework covers dp x tp x pp and deep configs whose layer stacks
exceed one chip's HBM can train.

TPU-native design — the shard_map + ppermute microbatch schedule (the
"How to Scale Your Model" pipelining recipe), not a graph-partitioner:

  - The transceiver's two homogeneous layer stacks (N x EncoderLayer,
    N x DecoderLayer — models/transformer.py) are STACKED along a leading
    layer axis and sharded over the mesh's `pp` axis: each device group
    owns n_layers/pp consecutive layers of BOTH stacks (and their Adam
    moments — the dominant per-layer memory), applied via `lax.scan` over
    the local slice.
  - The forward runs as two chained GPipe loops inside `shard_map`:
    microbatches enter stage 0, `lax.ppermute` carries activations
    stage i -> i+1 each tick, stage pp-1 accumulates outputs. A pipeline
    of S stages and M microbatches fills in S-1 ticks, so the bubble
    fraction is (S-1)/(M+S-1) per stack.
  - Everything OUTSIDE the stacks — token embeddings, channel
    encoder/decoder + channel sim, final projection + fused CE — is tiny
    (HBM and FLOPs both dominated by the stacks at depth) and runs
    replicated over pp / GSPMD-sharded over dp between the two loops.
  - `tp` composes as a third mesh axis (pp x tp x dp): the vocab-owning
    params shard over tp and the projection+CE runs as the explicit-
    collective vocab-parallel CE (tensor_parallel.py) with its ROWS
    sharded over (pp, dp) — so the one op that dominates FLOPs at
    reference scale uses every chip of the 3-D mesh.
  - The backward is jax.grad through the whole thing: ppermute transposes
    to the reverse permute, so the backward pipeline runs automatically
    in the opposite direction with the same schedule.
  - `dp` composes orthogonally: microbatch rows are sharded over `dp`
    inside the same shard_map (the pipeline is row-independent), and the
    gradient all-reduce over dp is inserted by GSPMD outside.

Numerics: with dropout=0 the pp step computes exactly the single-device
program per microbatch (same channel key, same masks), so its loss matches
make_train_step to reduction-order tolerance (tested in
tests/test_pipeline.py). With dropout>0 the dropout STREAMS differ from
the flax single-device step (per-layer fold_in keys instead of flax's
module-order split) — statistically equivalent, documented here.

Vanilla transformer transceiver only (the star codecs are not a
homogeneous layer chain; they scale via dp/tp)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepsc_gan_tpu.models.channel import (
    ChannelDecoder,
    ChannelEncoder,
    channel as channel_fn,
)
from deepsc_gan_tpu.models.transformer import (
    DecoderLayer,
    EncoderLayer,
    TokenEmbed,
)
from deepsc_gan_tpu.ops.fused_ce import fused_ce_loss
from deepsc_gan_tpu.ops.masks import create_masks
from deepsc_gan_tpu.train.steps import (
    TrainState,
    _final_wb,
    _loss_kwargs,
    _shift_targets,
    _step_noise,
    create_train_state,
)
from deepsc_gan_tpu.utils.config import Config


# --------------------------------------------------------------------------
# param layout: standard layer{i} subtrees <-> stacked (L, ...) pytrees
# --------------------------------------------------------------------------

def to_pp_params(params: dict, cfg: Config) -> dict:
    """Standard param tree -> pipeline layout:
    {"enc_stack": (Ne, ...) tree, "dec_stack": (Nd, ...) tree,
     "rest": everything else (embeds, channel codecs, final proj)}."""
    enc = params["semantic_encoder"]
    dec = params["semantic_decoder"]
    enc_layers = [enc[f"layer{i}"] for i in range(cfg.encoder_num_layer)]
    dec_layers = [dec[f"layer{i}"] for i in range(cfg.decoder_num_layer)]
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    rest = {
        "semantic_encoder": {"embed": enc["embed"]},
        "semantic_decoder": {k: v for k, v in dec.items()
                             if not k.startswith("layer")},
        # channel codecs, and any extra top-level modules the variant
        # carries (TransceiverGAN's generator) — replicated over pp
        **{k: v for k, v in params.items()
           if k not in ("semantic_encoder", "semantic_decoder")},
    }
    return {"enc_stack": stack(enc_layers), "dec_stack": stack(dec_layers),
            "rest": rest}


def from_pp_params(pp: dict, cfg: Config) -> dict:
    """Inverse of to_pp_params — back to the standard layout (for
    checkpoints, eval, and the greedy/beam decoders)."""
    out = jax.tree.map(lambda x: x, pp["rest"])  # shallow copy
    for i in range(cfg.encoder_num_layer):
        out["semantic_encoder"][f"layer{i}"] = jax.tree.map(
            lambda x, i=i: x[i], pp["enc_stack"])
    for i in range(cfg.decoder_num_layer):
        out["semantic_decoder"][f"layer{i}"] = jax.tree.map(
            lambda x, i=i: x[i], pp["dec_stack"])
    return out


def _pp_spec_rule(pp_axis: str, cfg: Optional[Config] = None,
                  tp_axis: Optional[str] = None):
    """Leaves under enc_stack/dec_stack are sharded on the layer axis.
    With `tp_axis` (pp x tp composition) the vocab-owning params in
    `rest` — final projection / tied decoder table / output bias — are
    additionally sharded on the vocab axis (tensor_parallel.py rule)."""
    vocab_rule = None
    if tp_axis is not None and cfg is not None:
        from deepsc_gan_tpu.parallel.tensor_parallel import (
            _vocab_param_spec)
        vocab_rule = _vocab_param_spec(cfg, tp_axis)

    def spec(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if ("enc_stack" in keys or "dec_stack" in keys) and getattr(
                leaf, "ndim", 0) >= 1:
            return P(pp_axis)
        if vocab_rule is not None:
            s = vocab_rule(path, leaf)
            if getattr(leaf, "ndim", 0) >= len(s):
                return s
        return P()

    return spec


def create_pp_train_state(model, cfg: Config, key, mesh: Mesh,
                          pp_axis: str = "pp",
                          tp_axis: Optional[str] = None,
                          **init_kwargs) -> TrainState:
    """Init a TrainState in the pipeline layout, layer stacks (and their
    fresh Adam moments) sharded over `pp` (and, with `tp_axis`, the
    vocab-owning params over tp). Use from_pp_params on state.params for
    eval/checkpoint interop."""
    base = create_train_state(model, cfg, key, **init_kwargs)
    pp_params = to_pp_params(base.params, cfg)
    tx = base.tx
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pp_params,
                       opt_state=tx.init(pp_params), tx=tx,
                       ema_params=(to_pp_params(base.ema_params, cfg)
                                   if base.ema_params is not None else None),
                       ema_decay=base.ema_decay)
    return shard_pp_state(state, mesh, pp_axis, cfg=cfg, tp_axis=tp_axis)


def pp_state_to_standard(state: TrainState, cfg: Config) -> TrainState:
    """Convert a pp-layout TrainState (stacked layer axes in params,
    ema_params, and the Adam moments) back to the standard layout, so
    checkpoints written by a pipeline run interoperate with evaluate/
    decoders and non-pp resumes."""
    def is_pp(t):
        return isinstance(t, dict) and "enc_stack" in t

    return jax.tree.map(
        lambda t: from_pp_params(t, cfg) if is_pp(t) else t,
        state, is_leaf=is_pp)


def standard_state_to_pp(state: TrainState, cfg: Config, mesh: Mesh,
                         pp_axis: str = "pp",
                         tp_axis: Optional[str] = None) -> TrainState:
    """Inverse of pp_state_to_standard + placement: convert a
    standard-layout TrainState (e.g. restored from an epoch checkpoint by
    `cli train --resume`) into the stacked pipeline layout — params,
    ema_params, and the Adam moments inside opt_state all carry over —
    and shard it on the mesh. Resume then continues with the exact
    moments/step the checkpoint recorded."""
    def is_std(t):
        return isinstance(t, dict) and "semantic_encoder" in t

    converted = jax.tree.map(
        lambda t: to_pp_params(t, cfg) if is_std(t) else t,
        state, is_leaf=is_std)
    return shard_pp_state(converted, mesh, pp_axis, cfg=cfg, tp_axis=tp_axis)


def shard_pp_state(state: TrainState, mesh: Mesh,
                   pp_axis: str = "pp", cfg: Optional[Config] = None,
                   tp_axis: Optional[str] = None) -> TrainState:
    """Place a pp-layout TrainState on the mesh: stack leaves sharded on
    the layer axis over pp, vocab-owning params over tp when `tp_axis`
    (and cfg) are given, everything else replicated."""
    rule = _pp_spec_rule(pp_axis, cfg, tp_axis)

    def put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, rule(path, leaf)))

    params = jax.tree_util.tree_map_with_path(put, state.params)
    opt_state = jax.tree_util.tree_map_with_path(put, state.opt_state)
    ema = (jax.tree_util.tree_map_with_path(put, state.ema_params)
           if state.ema_params is not None else None)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state.replace(step=step, params=params, opt_state=opt_state,
                         ema_params=ema)


# --------------------------------------------------------------------------
# the GPipe loop (runs inside shard_map)
# --------------------------------------------------------------------------

def _gpipe(layer_apply: Callable, local_stack, x_mb, extras_mb, base_key,
           layers_local: int, pp: int, pp_axis: str):
    """One homogeneous pipeline: x_mb (n_micro, mb, ...) microbatched
    input (replicated over pp), local_stack a (layers_local, ...) param
    tree (this stage's slice), extras_mb a pytree of per-microbatch aux
    with leading n_micro. Returns (n_micro, mb, ...) — VALID ON THE LAST
    STAGE ONLY (callers take the stage pp-1 copy via out_specs).

    Schedule: tick t, stage s processes microbatch t-s (idle stages
    compute on don't-care data that carries zero cotangent). n_micro +
    pp - 1 ticks, statically unrolled — pp and n_micro are small."""
    stage = jax.lax.axis_index(pp_axis)
    n_micro = x_mb.shape[0]
    perm = [(i, i + 1) for i in range(pp - 1)]

    def run_stage(h, mb_idx):
        ex = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0,
                                                   keepdims=False),
            extras_mb)

        def body(carry, xs):
            p_layer, li = xs
            k = jax.random.fold_in(
                jax.random.fold_in(base_key, stage * layers_local + li),
                mb_idx)
            return layer_apply(p_layer, carry, ex, k), None

        h, _ = jax.lax.scan(
            body, h, (local_stack, jnp.arange(layers_local)))
        return h

    recv = jnp.zeros_like(x_mb[0])
    out = jnp.zeros_like(x_mb)
    for t in range(n_micro + pp - 1):
        mb_idx = jnp.clip(t - stage, 0, n_micro - 1)
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(jnp.int32(t), n_micro - 1), 0, keepdims=False)
        h = run_stage(jnp.where(stage == 0, feed, recv), mb_idx)
        # the last stage overwrites its early don't-care writes at idx 0
        # before the first valid output (t = pp-1) lands there
        out = jax.lax.dynamic_update_index_in_dim(out, h, mb_idx, 0)
        if perm:
            recv = jax.lax.ppermute(h, pp_axis, perm)
    return out


# --------------------------------------------------------------------------
# the train step
# --------------------------------------------------------------------------

class _PPForward:
    """Shared construction for the pp step makers (plain + FGM attack):
    validates the mesh/config, rebuilds the stage modules from cfg, wires
    the two shard-mapped GPipe loops, and exposes the forward's two halves
    as pure functions of the pp-layout params —

      encode(params, inp, enc_mask, k_emb, k_pipe) -> tx (B, L, Cdim)
      transmit(k_ch, tx, p, pnr_db, n_std) -> received y
      decode_loss(params, y, tar_inp, tar_real, cmask, dmask, k_emb,
                  k_pipe) -> scalar masked CE (fused projection+CE)

    — i.e. exactly the staged decomposition every attack in the system
    differentiates at (models/transceiver.py docstring: grads w.r.t. the
    intermediate tx or y)."""

    def __init__(self, model, cfg: Config, mesh: Mesh, n_micro: int,
                 channel_kind: Optional[str], pp_axis: str,
                 dp_axis: Optional[str], tp_axis: Optional[str] = None):
        self.kind = channel_kind or cfg.channel
        self.lkw = _loss_kwargs(cfg)
        self.cfg = cfg
        pp = self.pp = mesh.shape[pp_axis]
        dp = mesh.shape.get(dp_axis, 1) if dp_axis else 1
        dp_in_mesh = self.dp_in_mesh = (
            dp_axis if (dp_axis and dp_axis in mesh.shape) else None)
        self.tp_in_mesh = (tp_axis if (tp_axis and tp_axis in mesh.shape
                                       and mesh.shape[tp_axis] > 1)
                           else None)
        if self.tp_in_mesh and cfg.vocab_size % mesh.shape[self.tp_in_mesh]:
            raise ValueError(
                f"vocab {cfg.vocab_size} % tp "
                f"{mesh.shape[self.tp_in_mesh]} != 0 — pad the vocab "
                "(Config.vocab_size) to a multiple of tp")
        self.pp_axis, self.mesh, self.n_micro = pp_axis, mesh, n_micro
        ne, nd = cfg.encoder_num_layer, cfg.decoder_num_layer
        if type(model).__name__ not in ("Transceiver", "TransceiverGAN"):
            raise ValueError(
                "the pp steps rebuild the vanilla enc/dec stacks from "
                f"cfg; got variant {type(model).__name__} — its param "
                "tree would not match the pipeline stages (star codecs "
                "are not a homogeneous layer chain)")
        if ne % pp or nd % pp:
            raise ValueError(
                f"pp={pp} must divide the layer counts ({ne}, {nd})")
        if cfg.bs % (n_micro * dp):
            raise ValueError(
                f"batch {cfg.bs} % (n_micro*dp = {n_micro}*{dp}) != 0")
        self.mb = cfg.bs // n_micro
        dtype = jnp.dtype(cfg.dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)

        enc_layer = EncoderLayer(cfg.encoder_d_model, cfg.encoder_num_heads,
                                 cfg.encoder_d_ff, cfg.encoder_dropout,
                                 cfg.ffn_mode, dtype=dtype,
                                 param_dtype=param_dtype)
        dec_layer = DecoderLayer(cfg.decoder_d_model, cfg.decoder_num_heads,
                                 cfg.decoder_d_ff, cfg.decoder_dropout,
                                 cfg.ffn_mode, dtype=dtype,
                                 param_dtype=param_dtype)
        self.embed_enc = TokenEmbed(cfg.vocab_size, cfg.encoder_d_model,
                                    cfg.encoder_dropout, dtype=dtype,
                                    param_dtype=param_dtype)
        self.embed_dec = TokenEmbed(cfg.vocab_size, cfg.decoder_d_model,
                                    cfg.decoder_dropout, dtype=dtype,
                                    param_dtype=param_dtype)
        self.chan_enc = ChannelEncoder(cfg.channel_hidden, cfg.channel_dim,
                                       dtype=dtype, param_dtype=param_dtype)
        self.chan_dec = ChannelDecoder(cfg.decoder_d_model,
                                       cfg.channel_dec_hidden,
                                       dtype=dtype, param_dtype=param_dtype)

        def _dp_key(key):
            # distinct dropout masks per dp shard (rows differ across
            # shards); no-op when dropout == 0 (flax Dropout
            # short-circuits rate 0)
            if dp_in_mesh:
                return jax.random.fold_in(
                    key, jax.lax.axis_index(dp_in_mesh))
            return key

        def enc_apply(p_layer, h, mask, key):
            return enc_layer.apply({"params": p_layer}, h, mask,
                                   deterministic=False,
                                   rngs={"dropout": _dp_key(key)})

        def dec_apply(p_layer, h, ex, key):
            mem, lam, pm = ex
            return dec_layer.apply({"params": p_layer}, h, mem, lam, pm,
                                   deterministic=False,
                                   rngs={"dropout": _dp_key(key)})

        if cfg.remat:
            enc_apply = jax.checkpoint(enc_apply, prevent_cse=False)
            dec_apply = jax.checkpoint(dec_apply, prevent_cse=False)

        kl_e, kl_d = ne // pp, nd // pp
        stack_spec = P(pp_axis)
        # microbatch rows over dp, microbatch index replicated over pp
        data_spec = P(None, dp_in_mesh) if dp_in_mesh else P(None)
        self.data_spec = data_spec

        def enc_pipe(local_stack, x_mb, mask_mb, key):
            return _gpipe(enc_apply, local_stack, x_mb, mask_mb, key,
                          kl_e, pp, pp_axis)

        def dec_pipe(local_stack, x_mb, extras, key):
            return _gpipe(dec_apply, local_stack, x_mb, extras, key,
                          kl_d, pp, pp_axis)

        self.enc_pipe = shard_map(
            enc_pipe, mesh=mesh,
            in_specs=(stack_spec, data_spec, data_spec, P()),
            out_specs=P(pp_axis, dp_in_mesh) if dp_in_mesh
            else P(pp_axis),
            check_vma=False)
        self.dec_pipe = shard_map(
            dec_pipe, mesh=mesh,
            in_specs=(stack_spec, data_spec,
                      (data_spec, data_spec, data_spec), P()),
            out_specs=P(pp_axis, dp_in_mesh) if dp_in_mesh
            else P(pp_axis),
            check_vma=False)

        # --- pp x tp: vocab-parallel projection+CE (tensor_parallel.py
        # recipe) with the CE ROWS sharded over (pp, dp) — the projection
        # matmul, the FLOPs-dominant op at reference scale, then uses
        # every chip instead of idling the pp groups — and the vocab axis
        # over tp. Falls back to rows-over-dp when B*L doesn't divide.
        self._ce_mapped = None
        if self.tp_in_mesh:
            from deepsc_gan_tpu.parallel.tensor_parallel import (
                vocab_parallel_ce_rows)
            tp_name = self.tp_in_mesh
            vs = cfg.vocab_size // mesh.shape[tp_name]
            alpha = self.lkw.get("label_smoothing") or 0.0
            n_rows = cfg.bs * (cfg.seq_len - 1)  # tar_real = tar[:, 1:]
            row_axes = tuple(
                a for a in (pp_axis, dp_in_mesh)
                if a is not None)
            n_shards = 1
            for a in row_axes:
                n_shards *= mesh.shape[a]
            if n_rows % n_shards:
                row_axes = (dp_in_mesh,) if dp_in_mesh else ()
                n_shards = mesh.shape[dp_in_mesh] if dp_in_mesh else 1

            def ce_shard(hidden, W, b, labels, mask):
                n_global = hidden.shape[0] * n_shards
                off = jax.lax.axis_index(tp_name) * vs
                ce = vocab_parallel_ce_rows(hidden, W, b, labels, off,
                                            tp_name, alpha, cfg.vocab_size)
                s = jnp.sum(ce * mask)
                if row_axes:
                    s = jax.lax.psum(s, row_axes)
                return s / n_global

            row_spec = P(row_axes) if row_axes else P()
            self._ce_mapped = shard_map(
                ce_shard, mesh=mesh,
                in_specs=(row_spec, P(None, tp_name), P(tp_name),
                          row_spec, row_spec),
                out_specs=P(), check_vma=False)

    # --- the forward's halves, split at the channel ----------------------

    def last_stage(self, y):
        # out_specs concatenated the pp stages on axis 0: (pp*n_micro, ...)
        # -> the LAST stage's (n_micro, ...) block holds the real outputs
        return y.reshape((self.pp, self.n_micro) + y.shape[1:])[-1]

    def micro(self, x):
        return x.reshape((self.n_micro, self.mb) + x.shape[1:])

    def encode(self, params, inp, enc_mask, k_emb, k_pipe):
        """embed (replicated) -> pipelined encoder stack -> channel
        encoder; returns the power-normalized tx symbols (B, L, Cdim)."""
        cfg, rest = self.cfg, params["rest"]
        x = self.embed_enc.apply(
            {"params": rest["semantic_encoder"]["embed"]}, inp,
            deterministic=False, rngs={"dropout": k_emb})
        h_enc = self.last_stage(self.enc_pipe(
            params["enc_stack"], self.micro(x), self.micro(enc_mask),
            k_pipe))
        sema = h_enc.reshape((cfg.bs,) + h_enc.shape[2:])
        return self.chan_enc.apply({"params": rest["channel_encoder"]}, sema)

    def transmit(self, k_ch, tx, p, pnr_db, n_std):
        """Channel sim on the full batch at once — identical to the
        single-device stage composition (models/transceiver.py:51-76)."""
        return channel_fn(k_ch, tx, p, pnr_db, n_std, kind=self.kind,
                          equalizer=self.cfg.equalizer,
                          per_sample=self.cfg.fading_per_sample)

    def decode_loss(self, params, y, tar_inp, tar_real, combined_mask,
                    dec_mask, k_emb, k_pipe):
        """channel decoder -> embed -> pipelined decoder stack -> fused
        projection+CE; differentiable in `y` (the FGM attack point)."""
        cfg, rest = self.cfg, params["rest"]
        mem = self.chan_dec.apply({"params": rest["channel_decoder"]}, y)
        xd = self.embed_dec.apply(
            {"params": rest["semantic_decoder"]["embed"]}, tar_inp,
            deterministic=False, rngs={"dropout": k_emb})
        h_dec = self.last_stage(self.dec_pipe(
            params["dec_stack"], self.micro(xd),
            (self.micro(mem), self.micro(combined_mask),
             self.micro(dec_mask)),
            k_pipe))
        hidden = h_dec.reshape((cfg.bs,) + h_dec.shape[2:])
        W, bb = _final_wb(rest)
        if self._ce_mapped is not None:
            # vocab-sharded explicit-collective CE (pp x tp); same mask
            # and mean-over-all-positions semantics as fused_ce_loss
            mask = (tar_real != cfg.pad_idx).astype(jnp.float32)
            for tid in (self.lkw.get("extra_masked_ids") or ()):
                mask = mask * (tar_real != tid).astype(jnp.float32)
            d = hidden.shape[-1]
            return self._ce_mapped(
                hidden.reshape(-1, d).astype(jnp.float32), W, bb,
                tar_real.reshape(-1).astype(jnp.int32), mask.reshape(-1))
        return fused_ce_loss(hidden, W, bb, tar_real,
                             chunk=cfg.ce_chunk, **self.lkw)

    # --- jit plumbing -----------------------------------------------------

    def state_shardings(self, state):
        rule = _pp_spec_rule(self.pp_axis, self.cfg, self.tp_in_mesh)

        def nsh(path, leaf):
            return NamedSharding(self.mesh, rule(path, leaf))

        pspecs = jax.tree_util.tree_map_with_path(nsh, state.params)
        ospecs = jax.tree_util.tree_map_with_path(nsh, state.opt_state)
        especs = (jax.tree_util.tree_map_with_path(nsh, state.ema_params)
                  if state.ema_params is not None else None)
        repl = NamedSharding(self.mesh, P())
        return TrainState(step=repl, params=pspecs, opt_state=ospecs,
                          tx=state.tx, ema_params=especs,
                          ema_decay=state.ema_decay)

    def jit_maker(self, step, n_scalars: int):
        """Curried maker: state -> jitted step with pp/dp shardings pinned
        (inp, tar data-sharded over dp; `n_scalars` trailing replicated
        scalar args)."""

        def make(state):
            sshard = self.state_shardings(state)
            repl = NamedSharding(self.mesh, P())
            data = (NamedSharding(self.mesh, P(self.dp_in_mesh))
                    if self.dp_in_mesh else repl)
            return jax.jit(
                step,
                in_shardings=(sshard, data, data) + (repl,) * n_scalars,
                out_shardings=(sshard, repl))

        return make


def make_pp_train_step(model, cfg: Config, mesh: Mesh, n_micro: int = 4,
                       channel_kind: Optional[str] = None,
                       pp_axis: str = "pp",
                       dp_axis: Optional[str] = "dp",
                       tp_axis: Optional[str] = None) -> Callable:
    """Pipeline(+data)-parallel plain train step for the vanilla
    transceiver. Returns a curried maker: `make_pp_train_step(...)(state)`
    -> jitted `step(state, inp, tar, key, n_std) -> (state, loss)` with
    `state` in the pp layout (create_pp_train_state).

    Requires encoder_num_layer % pp == decoder_num_layer % pp == 0 and
    cfg.bs % (n_micro * dp) == 0. `dp_axis=None` (or absent from the
    mesh) gives a pure-pp 1-D pipeline. `tp_axis` (present in the mesh)
    composes vocab tensor parallelism: the final projection + CE runs
    vocab-sharded over tp with rows over (pp, dp) — see _PPForward."""
    fw = _PPForward(model, cfg, mesh, n_micro, channel_kind, pp_axis,
                    dp_axis, tp_axis)

    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical key split to make_train_step so the channel noise (and
        # hence the dropout-free loss) matches the single-device step
        k_ch, k_do, k_snr = jax.random.split(key, 3)
        n_std_t = _step_noise(cfg, k_snr, n_std)
        p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                      jnp.float32)
        k_emb_e, k_emb_d, k_enc, k_dec = jax.random.split(k_do, 4)

        def loss_fn(params):
            tx_sym = fw.encode(params, inp, enc_mask, k_emb_e, k_enc)
            y = fw.transmit(k_ch, tx_sym, p, 0.0, n_std_t)
            return fw.decode_loss(params, y, tar_inp, tar_real,
                                  combined_mask, dec_mask, k_emb_d, k_dec)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return fw.jit_maker(step, n_scalars=2)


def make_pp_attack_step(model, cfg: Config, mesh: Mesh, n_micro: int = 4,
                        channel_kind: Optional[str] = None,
                        adv_weight: float = 1.0,
                        pp_axis: str = "pp",
                        dp_axis: Optional[str] = "dp",
                        tp_axis: Optional[str] = None) -> Callable:
    """Pipeline(+data)-parallel FGM adversarial step (the reference's core
    robust-training loop, `train_attack_step` utlis/trainer.py:30-64) for
    the vanilla transceiver.

    Two pipelined forwards per update, exactly the single-device
    make_train_attack_step schedule:
      phase 1 — encode pipeline -> channel (p=0) -> grad of the decode-side
        loss w.r.t. the RECEIVED symbols y (the ppermute loops transpose,
        so the backward pipeline runs stage pp-1 -> 0 automatically);
        r = fgm_normalize(g_y, eps).
      phase 2 — full pipelined forward with perturbation p=r; update on
        the (mixed) adversarial objective (`adv_weight` semantics as in
        train/steps.py:make_train_attack_step; reference = 1.0).

    With dropout=0 the losses/updates match the single-device step to
    reduction-order tolerance (tests/test_pipeline.py). Returns a curried
    maker: `(state) -> step(state, inp, tar, key, pnr_db, n_std, epsilon)
    -> (state, (clean_loss, adv_loss))`."""
    from deepsc_gan_tpu.train.attacks import fgm_normalize

    fw = _PPForward(model, cfg, mesh, n_micro, channel_kind, pp_axis,
                    dp_axis, tp_axis)

    def step(state: TrainState, inp, tar, key, pnr_db, n_std, epsilon):
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical channel-key split to the single-device attack step so
        # the dropout-free losses match at the same key
        k_ch1, k_ch2, k_do1, k_do2 = jax.random.split(key, 4)
        ke1, kd1, kpe1, kpd1 = jax.random.split(k_do1, 4)
        ke2, kd2, kpe2, kpd2 = jax.random.split(k_do2, 4)
        p0 = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                       jnp.float32)

        # ---- phase 1: forward at p=0, grad of loss w.r.t. received y
        def loss_wrt_y(y, params):
            return fw.decode_loss(params, y, tar_inp, tar_real,
                                  combined_mask, dec_mask, kd1, kpd1)

        tx_sym = fw.encode(state.params, inp, enc_mask, ke1, kpe1)
        y1 = fw.transmit(k_ch1, tx_sym, p0, pnr_db, n_std)
        clean_loss, g_y = jax.value_and_grad(loss_wrt_y)(y1, state.params)
        r = fgm_normalize(g_y, epsilon)

        # ---- phase 2: forward with p = r; update on the (mixed) objective
        def adv_loss_fn(params):
            tx2 = fw.encode(params, inp, enc_mask, ke2, kpe2)
            y_adv = fw.transmit(k_ch2, tx2, r, pnr_db, n_std)
            adv = fw.decode_loss(params, y_adv, tar_inp, tar_real,
                                 combined_mask, dec_mask, kd2, kpd2)
            if adv_weight >= 1.0:
                return adv, adv  # reference behavior: adversarial only
            y_c = fw.transmit(k_ch2, tx2, p0, pnr_db, n_std)
            clean = fw.decode_loss(params, y_c, tar_inp, tar_real,
                                   combined_mask, dec_mask, kd2, kpd2)
            return adv_weight * adv + (1.0 - adv_weight) * clean, adv

        (_, adv_loss), grads = jax.value_and_grad(
            adv_loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), (clean_loss, adv_loss)

    return fw.jit_maker(step, n_scalars=4)


def make_pp_mine_step(model, cfg: Config, mesh: Mesh, n_micro: int = 4,
                      channel_kind: Optional[str] = None,
                      pp_axis: str = "pp",
                      dp_axis: Optional[str] = "dp",
                      tp_axis: Optional[str] = None) -> Callable:
    """Pipeline(+data)-parallel MINE joint step (quirk Q6 capability,
    train/mine_steps.py) for the vanilla transceiver: pipelined
    encode/decode, the MINE statistics network T (a tiny MLP, replicated)
    on the GLOBAL (tx, y) batch, transceiver update on ce - λ·MI, then
    the MINE update maximizing the DV bound against the UPDATED encoder —
    the exact single-device schedule. Completes the mode × parallelism
    matrix: every reference train loop now runs under pp.

    Returns a curried maker: `(state) ->
    step(state, mine_state, inp, tar, key, n_std)
    -> (state, mine_state, (ce, mi))`."""
    import optax

    from deepsc_gan_tpu.models.mine import MINE, mutual_information, \
        sample_batch

    fw = _PPForward(model, cfg, mesh, n_micro, channel_kind, pp_axis,
                    dp_axis, tp_axis)
    mine = MINE()
    lam = cfg.mine_lambda

    def step(state: TrainState, mine_state, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical key split to make_mine_train_step
        k_ch, k_do, k_perm = jax.random.split(key, 3)
        ke, kpe, kd, kpd = jax.random.split(k_do, 4)
        p0 = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                       jnp.float32)

        def encode_transmit(params):
            tx = fw.encode(params, inp, enc_mask, ke, kpe)
            return tx, fw.transmit(k_ch, tx, p0, 0.0, n_std)

        def mi_of(mine_params, tx, y):
            xm, ym = sample_batch(k_perm, tx, y)
            t_joint = mine.apply({"params": mine_params}, tx, y)
            t_marg = mine.apply({"params": mine_params}, xm, ym)
            return mutual_information(t_joint, t_marg)

        def net_loss(params, mine_params):
            tx, y = encode_transmit(params)
            ce = fw.decode_loss(params, y, tar_inp, tar_real,
                                combined_mask, dec_mask, kd, kpd)
            mi = mi_of(mine_params, tx, y)
            return ce - lam * mi, (ce, mi)

        # transceiver update (MINE params held fixed)
        (_, (ce, mi)), grads = jax.value_and_grad(
            net_loss, argnums=0, has_aux=True)(state.params,
                                               mine_state.params)
        state = state.apply_gradients(grads)

        # MINE update against the UPDATED encoder: only encode/transmit
        # feed the bound (the decode path carries no mine gradient)
        def mine_obj(mine_params):
            tx, y = encode_transmit(state.params)
            return -mi_of(mine_params, tx, y)

        g_mine = jax.grad(mine_obj)(mine_state.params)
        upd, new_opt = mine_state.tx.update(g_mine, mine_state.opt_state,
                                            mine_state.params)
        mine_state = mine_state.replace(
            params=optax.apply_updates(mine_state.params, upd),
            opt_state=new_opt)
        return state, mine_state, (ce, mi)

    def make(state):
        sshard = fw.state_shardings(state)
        repl = NamedSharding(mesh, P())
        data = (NamedSharding(mesh, P(fw.dp_in_mesh))
                if fw.dp_in_mesh else repl)
        return jax.jit(step,
                       in_shardings=(sshard, repl, data, data, repl, repl),
                       out_shardings=(sshard, repl, repl))

    return make


def _pp_phase_mask(pp_params: dict, include=None, exclude=None):
    """train/gan_steps.phase_mask semantics on the PIPELINE param layout:
    enc_stack counts as `semantic_encoder`, dec_stack as
    `semantic_decoder`, and rest's entries by their own top-level name
    (embeds carry their owning module's name, so the reference's
    name-based phase membership is preserved leaf-for-leaf)."""

    def sel(name):
        if include is not None:
            return name in include
        return name not in (exclude or ())

    return {
        "enc_stack": jax.tree.map(lambda _: sel("semantic_encoder"),
                                  pp_params["enc_stack"]),
        "dec_stack": jax.tree.map(lambda _: sel("semantic_decoder"),
                                  pp_params["dec_stack"]),
        "rest": {k: jax.tree.map(lambda _: sel(k), v)
                 for k, v in pp_params["rest"].items()},
    }


def make_pp_gan_step(model, cfg: Config, mesh: Mesh, n_micro: int = 4,
                     channel_kind: Optional[str] = None,
                     pp_axis: str = "pp",
                     dp_axis: Optional[str] = "dp",
                     tp_axis: Optional[str] = None) -> Callable:
    """Pipeline(+data)-parallel GAN three-phase step (reference
    `gan_train_step`, utlis/gan_train.py:8-50) for the TransceiverGAN.

    One pipelined encode, generator on the tx symbols (tiny, replicated),
    channel run twice (perturbed + clean), TWO pipelined decodes, three
    losses, and the reference's three selective updates from ONE shared
    Adam (train/gan_steps.selective_update with the phase masks mapped
    onto the pipeline param layout). With dropout=0 the losses/updates
    match the single-device make_gan_train_step to reduction-order
    tolerance (tests/test_pipeline.py). Returns a curried maker:
    `(state) -> step(state, inp, tar, key, n_std)
    -> (state, (loss, g_loss, d_loss))`."""
    from deepsc_gan_tpu.models.gan import Generator
    from deepsc_gan_tpu.train.gan_steps import GENERATOR, TX_SIDE, \
        selective_update

    if type(model).__name__ != "TransceiverGAN":
        raise ValueError("make_pp_gan_step needs the gan variant "
                         f"(TransceiverGAN); got {type(model).__name__}")
    fw = _PPForward(model, cfg, mesh, n_micro, channel_kind, pp_axis,
                    dp_axis, tp_axis)
    gen = Generator(cfg.channel_hidden, cfg.channel_dim,
                    dtype=jnp.dtype(cfg.dtype),
                    param_dtype=jnp.dtype(cfg.param_dtype))

    def step(state: TrainState, inp, tar, key, n_std):
        tar_inp, tar_real = _shift_targets(tar)
        enc_mask, combined_mask, dec_mask = create_masks(inp, tar_inp,
                                                         cfg.pad_idx)
        # identical key split to make_gan_train_step (k_p's random p is
        # generated there but REPLACED by the generator output under
        # traingan=True — nothing to reproduce), and the same internal
        # split of k_ch into (perturbed, clean) channel keys as
        # TransceiverGAN.__call__
        _, k_ch, k_do = jax.random.split(key, 3)
        key_p, key_r = jax.random.split(k_ch)
        ke, kpe, kd, kpd = jax.random.split(k_do, 4)

        def losses(params):
            tx = fw.encode(params, inp, enc_mask, ke, kpe)
            p_gen = gen.apply({"params": params["rest"]["generator"]}, tx)
            y_p = fw.transmit(key_p, tx, p_gen, cfg.gan_pnr_db, n_std)
            y_r = fw.transmit(key_r, tx, jnp.zeros_like(tx),
                              cfg.gan_pnr_db, n_std)
            ce_p = fw.decode_loss(params, y_p, tar_inp, tar_real,
                                  combined_mask, dec_mask, kd, kpd)
            ce_r = fw.decode_loss(params, y_r, tar_inp, tar_real,
                                  combined_mask, dec_mask, kd, kpd)
            loss = ce_r
            g_loss = cfg.g_loss_ceiling - ce_p
            d_loss = cfg.gan_lambda * loss + (1.0 - cfg.gan_lambda) * ce_p
            return loss, g_loss, d_loss

        loss_v, g_v, d_v = losses(state.params)

        # three backward passes over the same pipelined forward (XLA
        # shares the common forward subexpressions across them)
        g_codec = jax.grad(lambda q: losses(q)[0])(state.params)
        g_gen = jax.grad(lambda q: losses(q)[1])(state.params)
        g_disc = jax.grad(lambda q: losses(q)[2])(state.params)

        state = selective_update(
            state, g_codec, _pp_phase_mask(state.params,
                                           exclude=(GENERATOR,)))
        state = selective_update(
            state, g_gen, _pp_phase_mask(state.params,
                                         include=(GENERATOR,)))
        state = selective_update(
            state, g_disc, _pp_phase_mask(state.params, exclude=TX_SIDE))
        if state.ema_params is not None:
            # selective_update bypasses apply_gradients; advance the EMA
            # shadow once per full 3-phase step (as make_gan_train_step)
            d = state.ema_decay
            state = state.replace(ema_params=jax.tree.map(
                lambda e, q: d * e + (1.0 - d) * q,
                state.ema_params, state.params))
        return state, (loss_v, g_v, d_v)

    return fw.jit_maker(step, n_scalars=2)
