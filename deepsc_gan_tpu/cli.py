"""Command-line entry points: preprocess / train / evaluate.

The reference has NO committed driver (SURVEY.md §1: the training loop
lived in untracked Jupyter notebooks with hard-coded Windows paths,
utlis/parameters.py:13-17). This CLI is that missing piece, built on the
framework's step functions:

  python -m deepsc_gan_tpu.cli preprocess --input-data-dir data/txt/en
  python -m deepsc_gan_tpu.cli train --variant transformer --epochs 3
  python -m deepsc_gan_tpu.cli train --variant gan --train-mode gan
  python -m deepsc_gan_tpu.cli evaluate --variant transformer \
      --eval-mode greedy --snr-lo 0 --snr-hi 18
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

from deepsc_gan_tpu.data.loader import (
    Dataset,
    load_token_lists,
    pad_sequences,
    stacked_batches,
    synthetic_dataset,
)
from deepsc_gan_tpu.data.vocab import Vocab
from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu, save_result_table
from deepsc_gan_tpu.evaluate.greedy import (
    make_greedy_decode_attack,
    make_greedy_decode_gan,
)
from deepsc_gan_tpu.models.channel import snr_to_noise
from deepsc_gan_tpu.models.transceiver import make_model
from deepsc_gan_tpu.train.gan_steps import make_gan_train_step
from deepsc_gan_tpu.train.mine_steps import create_mine_state, make_mine_train_step
from deepsc_gan_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_attack_step,
    make_train_step,
)
from deepsc_gan_tpu.utils.checkpoint import CheckpointManager
from deepsc_gan_tpu.utils.config import (
    Config,
    add_config_args,
    config_from_args,
    default_seq_len,
)
from deepsc_gan_tpu.utils.logging import MetricLogger

def _enable_compile_cache():
    """Persistent XLA compile cache — remote TPU compiles take minutes;
    repeat invocations should hit disk."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_compile_cache()


STAR_VARIANTS = ("star", "star_multi", "gan_star")
GAN_VARIANTS = ("gan", "gan_star")


def _is_star(variant: str) -> bool:
    # gan_star wraps the SE/SD star codec (models/transceiver.py:
    # TransceiverGANStar): star semantics for seq_len, position mode and
    # full-target losses
    return variant in STAR_VARIANTS


def _is_gan(variant: str) -> bool:
    return variant in GAN_VARIANTS


def _position_mode(variant: str) -> str:
    # star decoders are effectively non-autoregressive (their output length
    # is the MEMORY length and position i predicts token i) — single-shot
    # decode is the mode consistent with their training objective; the
    # reference's [:, -1:] behavior remains available as "last"
    return "oneshot" if _is_star(variant) else "step"


def _load_dataset(cfg: Config, path: str, shuffle: bool, seed: int = 0) -> Dataset:
    if os.path.exists(path):
        raw = load_token_lists(path)
        data = pad_sequences(raw, maxlen=cfg.seq_len)
        return Dataset(data, batch_size=cfg.bs, shuffle=shuffle, seed=seed)
    print(f"[data] {path} not found -> synthetic dataset", file=sys.stderr)
    return Dataset(
        synthetic_dataset(4096, cfg.seq_len, cfg.vocab_size, cfg.bs,
                          seed).data,
        batch_size=cfg.bs, shuffle=shuffle, seed=seed)


def _load_vocab(cfg: Config) -> Vocab:
    if os.path.exists(cfg.vocab_path):
        return Vocab.load(cfg.vocab_path)
    print(f"[data] {cfg.vocab_path} not found -> identity vocab",
          file=sys.stderr)
    t2i = {"<PAD>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    for i in range(4, cfg.vocab_size):
        t2i[f"w{i}"] = i
    return Vocab(t2i)


def _load_train_dataset(cfg: Config, seed: int):
    """Training dataset honoring Config.aug_* (data/augment.py)."""
    from deepsc_gan_tpu.data.augment import make_train_dataset

    path = cfg.train_save_path
    if os.path.exists(path):
        return make_train_dataset(load_token_lists(path), cfg, seed=seed)
    print(f"[data] {path} not found -> synthetic dataset", file=sys.stderr)
    return synthetic_dataset(4096, cfg.seq_len, cfg.vocab_size, cfg.bs,
                             seed)



def _variant_config(args) -> Config:
    """Config from args with the unset --seq-len resolved per variant
    (star aligns at 31 = 32 rows with the relay, transformer at 32 —
    utils/config.py:default_seq_len)."""
    cfg = config_from_args(args)
    if getattr(args, "seq_len", None) is None:
        cfg = cfg.replace(seq_len=default_seq_len(args.variant))
    # one chokepoint for the trace-time QKV packing switch: every command
    # builds its config here before any step/decode function is traced
    from deepsc_gan_tpu.ops.attention import set_qkv_fusion
    set_qkv_fusion(cfg.fuse_qkv)
    return cfg


import contextlib


@contextlib.contextmanager
def _kernel_switch_guard():
    """Snapshot + restore the module-level Pallas-kernel switches
    (attention and star satellite: mode + mesh registration) around a
    CLI command, so in-process callers don't inherit stale state."""
    from deepsc_gan_tpu.ops.pallas import attention as _attn
    from deepsc_gan_tpu.ops.pallas import star as _star

    a_mode, a_mesh = _attn._MODE, _attn.attn_kernel_mesh()
    s_mode, s_mesh = _star._MODE, _star.star_kernel_mesh()
    try:
        yield
    finally:
        _attn.set_attn_kernel_mode(a_mode)
        _attn._MESH_STATE = a_mesh
        _star.set_star_kernel_mode(s_mode)
        _star._MESH_STATE = s_mesh


def cmd_train(args) -> None:
    cfg = _variant_config(args)
    variant = args.variant
    mode = args.train_mode
    star = _is_star(variant)
    if args.distributed:
        from deepsc_gan_tpu.parallel.mesh import initialize_distributed
        initialize_distributed()

    from deepsc_gan_tpu.train.steps import make_step_key
    key = make_step_key(cfg, args.seed)
    model = make_model(cfg, variant)
    init_kw = {"traingan": True} if _is_gan(variant) else {}
    state = create_train_state(model, cfg, key, **init_kw)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))

    # --resume: restore params + Adam moments + step from the latest epoch
    # checkpoint (always saved in the STANDARD layout — pp runs convert at
    # save time) and continue from that epoch. The per-epoch PRNG fold-in
    # and Dataset.set_epoch reseeding below make the resumed run
    # bit-identical to the uninterrupted one (tests/test_cli.py).
    start_epoch = 0
    if args.resume:
        ckpt_dir = os.path.join(cfg.checkpoint_path, variant)
        mgr = CheckpointManager(ckpt_dir)
        latest = mgr.latest_epoch()
        if latest is None:
            raise SystemExit(f"--resume: no checkpoint under {ckpt_dir}")
        state = mgr.restore(state)
        mgr.close()
        start_epoch = int(latest)
        if start_epoch >= cfg.epochs:
            raise SystemExit(
                f"--resume: checkpoint is at epoch {start_epoch}, nothing "
                f"left to train (--epochs {cfg.epochs})")
        print(f"[train] resumed epoch {start_epoch} from {ckpt_dir} "
              f"(step {int(state.step)})")

    # --- pick the execution path (fastest available for the mode/mesh) ---
    # plain mode on one chip: K-step lax.scan per dispatch (bench-level
    # throughput — the chip may sit behind a high-latency tunnel);
    # dp/tp > 1: GSPMD / shard_map parallel steps over the mesh.
    # Every training path keeps the fused Pallas kernels (attention:
    # ops/pallas/attention.py, TPU default after the 1.77x/1.10x A/B;
    # star satellite: ops/pallas/star.py). GSPMD cannot partition a
    # Mosaic custom call, so the mesh paths handle it two ways:
    #   - pp: the pipeline body already runs per-device inside shard_map
    #     (+ per-layer lax.scan) — the kernels trace directly
    #     (tests/test_pipeline.py::test_pp_step_fused_attn_kernel_*);
    #   - dp / tp: set_*_kernel_mesh below nests each kernel call in a
    #     shard_map over the batch (dp) axis — activations are already
    #     batch-sharded there, so no resharding is introduced
    #     (tests/test_sharding.py, tests/test_tensor_parallel.py).
    mesh = None
    mine_state = None
    scan_k = max(1, args.scan_steps)
    if cfg.pp > 1:
        # GPipe pipeline parallelism over a (pp, dp) mesh
        # (parallel/pipeline.py); checkpoints are converted back to the
        # standard layout at save time so `evaluate` restores them
        want = "gan" if mode == "gan" else "transformer"
        if variant != want:
            raise SystemExit(f"--pp --train-mode {mode} needs --variant "
                             f"{want} (star codecs are not a homogeneous "
                             "layer chain — use --dp/--tp)")
        import numpy as np
        from jax.sharding import Mesh

        from deepsc_gan_tpu.parallel.pipeline import (
            create_pp_train_state,
            make_pp_attack_step,
            make_pp_gan_step,
            make_pp_mine_step,
            make_pp_train_step,
        )
        n_dev = cfg.pp * cfg.tp * cfg.dp
        if len(jax.devices()) < n_dev:
            raise SystemExit(f"--pp {cfg.pp} x --tp {cfg.tp} x --dp "
                             f"{cfg.dp} needs {n_dev} devices, have "
                             f"{len(jax.devices())}")
        # tp > 1 composes as a third mesh axis: the vocab projection+CE
        # runs vocab-sharded inside the pp step (parallel/pipeline.py)
        tp_ax = "tp" if cfg.tp > 1 else None
        if tp_ax:
            mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(
                cfg.pp, cfg.tp, cfg.dp), ("pp", "tp", "dp"))
        else:
            mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(
                cfg.pp, cfg.dp), ("pp", "dp"))
        if start_epoch > 0:
            # resumed: convert the restored STANDARD-layout state (params +
            # moments + EMA) to the stacked pipeline layout
            from deepsc_gan_tpu.parallel.pipeline import standard_state_to_pp
            state = standard_state_to_pp(state, cfg, mesh, tp_axis=tp_ax)
        else:
            state = create_pp_train_state(model, cfg, key, mesh,
                                          tp_axis=tp_ax, **init_kw)
        if mode == "attack":
            step = make_pp_attack_step(
                model, cfg, mesh, n_micro=cfg.pp_microbatches,
                adv_weight=args.adv_weight, tp_axis=tp_ax)(state)
        elif mode == "gan":
            step = make_pp_gan_step(model, cfg, mesh,
                                    n_micro=cfg.pp_microbatches,
                                    tp_axis=tp_ax)(state)
        elif mode == "mine":
            mine, mine_state = create_mine_state(cfg, key)
            step = make_pp_mine_step(model, cfg, mesh,
                                     n_micro=cfg.pp_microbatches,
                                     tp_axis=tp_ax)(state)
        else:
            step = make_pp_train_step(model, cfg, mesh,
                                      n_micro=cfg.pp_microbatches,
                                      tp_axis=tp_ax)(state)
        path = f"mesh{dict(mesh.shape)}:gpipe-{mode}"
    elif cfg.dp > 1 or cfg.tp > 1:
        from deepsc_gan_tpu.parallel.mesh import make_mesh
        if cfg.tp > 1:
            from deepsc_gan_tpu.parallel.tensor_parallel import (
                make_tp_attack_step,
                make_tp_gan_step,
                make_tp_mine_step,
                make_tp_train_step,
                shard_tp_state,
            )
            mesh = make_mesh(dp=cfg.dp, snr=cfg.tp,
                             axis_names=("tp", "dp"))
            # attention activations under the tp step are batch-sharded
            # over dp / replicated over tp: nest the fused kernels in a
            # shard_map over the dp axis (vocab-parallel CE untouched)
            from deepsc_gan_tpu.ops.pallas.attention import (
                set_attn_kernel_mesh,
            )
            from deepsc_gan_tpu.ops.pallas.star import set_star_kernel_mesh
            set_attn_kernel_mesh(mesh, "dp")
            set_star_kernel_mesh(mesh, "dp")
            if mode == "attack":
                step = make_tp_attack_step(
                    model, cfg, mesh, full_target=star,
                    adv_weight=args.adv_weight)(state)
            elif mode == "gan":
                step = make_tp_gan_step(model, cfg, mesh,
                                        full_target=star)(state)
            elif mode == "mine":
                from deepsc_gan_tpu.parallel.sharding import replicate
                mine, mine_state = create_mine_state(cfg, key)
                step = make_tp_mine_step(model, mine, cfg, mesh)(state)
                mine_state = replicate(mine_state, mesh)
            else:
                step = make_tp_train_step(model, cfg, mesh,
                                          full_target=star)(state)
            state = shard_tp_state(state, mesh, cfg)
        else:
            from deepsc_gan_tpu.parallel.sharding import (
                make_parallel_attack_step,
                make_parallel_gan_step,
                make_parallel_mine_step,
                make_parallel_train_step,
                replicate,
                shard_batch,
            )
            mesh = make_mesh(dp=cfg.dp, snr=1)
            # pure-dp keeps the fused Pallas kernels: each kernel call
            # nests a shard_map over the dp axis (no GSPMD rule needed)
            from deepsc_gan_tpu.ops.pallas.attention import (
                set_attn_kernel_mesh,
            )
            from deepsc_gan_tpu.ops.pallas.star import set_star_kernel_mesh
            set_attn_kernel_mesh(mesh, "dp")
            set_star_kernel_mesh(mesh, "dp")
            if mode == "gan":
                step = make_parallel_gan_step(model, cfg, mesh,
                                              full_target=star)
            elif mode == "attack":
                step = make_parallel_attack_step(
                    model, cfg, mesh, full_target=star,
                    adv_weight=args.adv_weight)
            elif mode == "mine":
                mine, mine_state = create_mine_state(cfg, key)
                step = make_parallel_mine_step(model, mine, cfg, mesh)
                mine_state = replicate(mine_state, mesh)
            else:
                step = make_parallel_train_step(model, cfg, mesh)
            state = replicate(state, mesh)
        path = f"mesh{dict(mesh.shape)}:{mode}"
    elif mode == "gan":
        step = make_gan_train_step(model, cfg, full_target=star)
        path = "gan3phase"
    elif mode == "attack":
        step = make_train_attack_step(model, cfg, full_target=star,
                                      adv_weight=args.adv_weight)
        path = "fgm"
    elif mode == "mine":
        mine, mine_state = create_mine_state(cfg, key)
        step = make_mine_train_step(model, mine, cfg)
        path = "mine"
    else:
        from deepsc_gan_tpu.train.steps import make_train_multi_step
        if scan_k > 1:
            step = make_train_multi_step(model, cfg, full_target=star)
            path = f"scan{scan_k}"
        else:
            step = make_train_step(model, cfg, full_target=star)
            path = "single"
    print(f"[train] variant={variant} mode={mode} path={path} "
          f"params={n_params:,}")

    train_ds = _load_train_dataset(cfg, args.seed)
    n_std = float(snr_to_noise(cfg.train_snr))
    logger = MetricLogger(os.path.join(cfg.log_save_path, "train.jsonl"))
    ckpt = CheckpointManager(
        os.path.join(cfg.checkpoint_path, variant), max_to_keep=5)

    # Async-dispatch training loop: never block on step results inside the
    # loop (the TPU may sit behind a network tunnel — a per-step sync would
    # serialize host->device latency into every step). Metrics are fetched
    # only at log points; XLA queues the steps back-to-back.
    stacker = (stacked_batches(train_ds, scan_k)
               if (mode == "plain" and mesh is None and scan_k > 1) else None)
    profiler_ctx = None
    if args.profile:
        from deepsc_gan_tpu.utils.profiling import trace
        profiler_ctx = trace(args.profile)
        profiler_ctx.__enter__()
        print(f"[train] profiling epoch 0 -> {args.profile}")
    # resumed logging offset: the scan path runs n_disp*scan_k steps per
    # epoch (= len(train_ds) rounded down to a scan_k multiple), so use
    # the path's effective steps/epoch for the step counter
    if stacker is not None:
        steps_per_epoch = max(1, len(train_ds) // scan_k) * scan_k
    else:
        steps_per_epoch = len(train_ds)
    step_i = start_epoch * steps_per_epoch
    t_epoch = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        # per-epoch PRNG stream + shuffle order are pure functions of
        # (root key/seed, epoch) — epoch E is identical whether reached by
        # continuous training or --resume (exact-resume contract)
        ekey = jax.random.fold_in(key, epoch)
        if hasattr(train_ds, "set_epoch"):
            train_ds.set_epoch(epoch)
        epoch_sents = len(train_ds) * cfg.bs
        if stacker is not None:
            n_disp = max(1, len(train_ds) // scan_k)
            epoch_sents = n_disp * scan_k * cfg.bs
            for _ in range(n_disp):
                ekey, sub = jax.random.split(ekey)
                batch = jax.numpy.asarray(next(stacker))
                state, losses = step(state, batch, batch, sub, n_std)
                step_i += scan_k
                if (step_i // scan_k) % args.log_every == 0:
                    logger.log(epoch=epoch, step=step_i,
                               loss=losses[-1])
        else:
            for inp, tar in train_ds:
                ekey, sub = jax.random.split(ekey)
                if mesh is not None and cfg.tp == 1:
                    from deepsc_gan_tpu.parallel.sharding import shard_batch
                    inp = shard_batch(jax.numpy.asarray(inp), mesh)
                    tar = shard_batch(jax.numpy.asarray(tar), mesh)
                if mode == "gan":
                    state, (loss, g_loss, d_loss) = step(state, inp, tar,
                                                         sub, n_std)
                    metrics = dict(loss=loss, g_loss=g_loss, d_loss=d_loss)
                elif mode == "attack":
                    state, (loss, loss_m) = step(state, inp, tar, sub,
                                                 args.pnr_db, n_std,
                                                 args.epsilon)
                    metrics = dict(loss=loss, loss_adv=loss_m)
                elif mode == "mine":
                    state, mine_state, (loss, mi) = step(state, mine_state,
                                                         inp, tar, sub,
                                                         n_std)
                    metrics = dict(loss=loss, mi=mi)
                else:
                    state, loss = step(state, inp, tar, sub, n_std)
                    metrics = dict(loss=loss)
                step_i += 1
                if step_i % args.log_every == 0:
                    # materializing metrics here is the only sync point
                    logger.log(epoch=epoch, step=step_i, **metrics)
        jax.block_until_ready(state.params)
        if profiler_ctx is not None:  # trace exactly the first epoch
            profiler_ctx.__exit__(None, None, None)
            profiler_ctx = None
        dt_epoch = time.time() - t_epoch
        t_epoch = time.time()
        logger.log(epoch=epoch, epoch_time=dt_epoch,
                   sents_per_sec=epoch_sents / dt_epoch)
        # a sync Orbax save costs seconds — at this model scale an epoch is
        # sub-second on TPU, so saving every epoch would dominate wall-clock
        if (epoch + 1) % args.ckpt_every == 0 or epoch + 1 == cfg.epochs:
            if cfg.pp > 1:
                # standard layout on disk -> evaluate/transmit restore it
                from deepsc_gan_tpu.parallel.pipeline import (
                    pp_state_to_standard)
                ckpt.save(epoch + 1, pp_state_to_standard(state, cfg))
            else:
                ckpt.save(epoch + 1, state)
            t_epoch = time.time()
    ckpt.close()  # join pending async writes before exit
    logger.close()
    print(f"[train] done: {step_i} steps")


def _restore_latest(cfg: Config, variant: str, state, tag: str):
    """Restore the latest checkpoint for `variant` if one exists; warn and
    keep the random init otherwise."""
    ckpt_dir = os.path.join(cfg.checkpoint_path, variant)
    if os.path.isdir(ckpt_dir):
        try:
            mgr = CheckpointManager(ckpt_dir)
            state = mgr.restore(state)
            print(f"[{tag}] restored epoch {mgr.latest_epoch()}")
            if state.ema_params is not None:
                # trained with --ema-decay: the shadow is what evaluation
                # (and transmit/export) should use
                state = state.replace(params=state.ema_params)
                print(f"[{tag}] using EMA shadow params")
            return state
        except FileNotFoundError:
            pass
    print(f"[{tag}] no checkpoint found; using random init",
          file=sys.stderr)
    return state


def cmd_evaluate(args) -> None:
    cfg = _variant_config(args)
    variant = args.variant
    star = _is_star(variant)
    pm = _position_mode(variant)
    # snr-parallel sweeps keep the fused Pallas kernels: every sweep in
    # parallel/sharding.py is an explicit shard_map over the snr axis, so
    # each device traces the vmapped decode (kernels batch under vmap by
    # growing the pallas grid) on its local SNR shard — no GSPMD
    # partitioning of the Mosaic custom call is ever required. The only
    # remaining XLA carve-out is `cli export` (StableHLO portability).

    key = jax.random.PRNGKey(args.seed)
    model = make_model(cfg, variant)
    init_kw = {"traingan": True} if _is_gan(variant) else {}
    state = create_train_state(model, cfg, key, **init_kw)
    state = _restore_latest(cfg, variant, state, tag="eval")

    vocab = _load_vocab(cfg)
    test_ds = _load_dataset(cfg, cfg.test_save_path, shuffle=False)
    batches = [inp for inp, _ in test_ds][: args.eval_batches]

    snrs = list(range(args.snr_lo, args.snr_hi + 1))
    if args.eval_mode == "greedy":
        # all SNR points in one device call per batch
        from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu_fast
        from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
        if args.snr_parallel > 1 and args.kv_cache:
            if pm != "step":
                raise SystemExit("--kv-cache requires an autoregressive "
                                 "decoder (vanilla transformer)")
            # KV-cached decode sharded over the snr axis via shard_map
            # (each device decodes its local SNR shard whole)
            from deepsc_gan_tpu.parallel.mesh import make_mesh
            from deepsc_gan_tpu.parallel.sharding import (
                make_parallel_greedy_kv_sweep)
            if len(snrs) % args.snr_parallel:
                raise SystemExit(
                    f"--snr-parallel {args.snr_parallel} must divide the "
                    f"number of SNR points ({len(snrs)})")
            mesh = make_mesh(dp=1, snr=args.snr_parallel)
            sweep_fn = make_parallel_greedy_kv_sweep(model, cfg, mesh)
        elif args.snr_parallel > 1:
            # shard the SNR axis of the sweep over a device mesh — each
            # device (group) decodes its own points of the BLEU-vs-SNR
            # curve (params/batch replicated, collectives over ICI)
            from deepsc_gan_tpu.parallel.mesh import make_mesh
            from deepsc_gan_tpu.parallel.sharding import (
                make_parallel_greedy_sweep)
            if len(snrs) % args.snr_parallel:
                raise SystemExit(
                    f"--snr-parallel {args.snr_parallel} must divide the "
                    f"number of SNR points ({len(snrs)})")
            mesh = make_mesh(dp=1, snr=args.snr_parallel)
            sweep_fn = make_parallel_greedy_sweep(model, cfg, mesh,
                                                  position_mode=pm)
        elif args.kv_cache and pm == "step":
            # KV-cached autoregressive decode (token-identical at f32)
            from deepsc_gan_tpu.evaluate.kv_decode import (
                make_greedy_decode_kv_sweep)
            sweep_fn = make_greedy_decode_kv_sweep(model, cfg)
        else:
            sweep_fn = make_greedy_decode_sweep(model, cfg,
                                                position_mode=pm)
        table = snr_sweep_bleu_fast(sweep_fn, state.params, batches, vocab,
                                    cfg, snrs=snrs, pnr_db=args.pnr_db,
                                    key=key, metric=args.metric)
        for snr, *ms in table:
            print(f"SNR={snr:.0f}dB " +
                  " ".join(f"{m:.4f}" for m in ms))
        save_result_table(table, os.path.join(
            cfg.log_save_path, f"test-{variant}-{args.eval_mode}.pkl"))
        return
    if args.eval_mode == "beam":
        if star:
            raise SystemExit(
                "beam search requires an autoregressive decoder; star "
                "decoders are non-autoregressive (position i predicts "
                "token i from the channel signal) — use --eval-mode "
                "greedy, which decodes them in one shot")
        from deepsc_gan_tpu.evaluate.beam import (
            make_beam_decode,
            make_beam_decode_kv,
        )
        if args.snr_parallel > 1:
            # beam sweep sharded over the mesh's snr axis (shard_map —
            # the fused candidate scorer is a Pallas kernel GSPMD can't
            # partition; each device decodes its SNR shard whole)
            from deepsc_gan_tpu.evaluate.evaluator import snr_sweep_bleu_fast
            from deepsc_gan_tpu.parallel.mesh import make_mesh
            from deepsc_gan_tpu.parallel.sharding import (
                make_parallel_beam_sweep)
            if args.beam_impl == "full":
                raise SystemExit("--snr-parallel beam runs the KV-cached "
                                 "serving impl (--beam-impl kv)")
            if len(snrs) % args.snr_parallel:
                raise SystemExit(
                    f"--snr-parallel {args.snr_parallel} must divide the "
                    f"number of SNR points ({len(snrs)})")
            mesh = make_mesh(dp=1, snr=args.snr_parallel)
            sweep_fn = make_parallel_beam_sweep(
                model, cfg, mesh, beam_size=args.beam_size)
            table = snr_sweep_bleu_fast(sweep_fn, state.params, batches,
                                        vocab, cfg, snrs=snrs,
                                        pnr_db=args.pnr_db, key=key,
                                        metric=args.metric)
            for snr, *ms in table:
                print(f"SNR={snr:.0f}dB " +
                      " ".join(f"{m:.4f}" for m in ms))
            save_result_table(table, os.path.join(
                cfg.log_save_path, f"test-{variant}-{args.eval_mode}.pkl"))
            return
        if args.beam_impl == "full":
            decode = make_beam_decode(model, cfg, beam_size=args.beam_size)
        else:  # KV-cached serving path (token-identical at f32)
            decode = make_beam_decode_kv(model, cfg,
                                         beam_size=args.beam_size)
        extra = ()
    elif args.eval_mode == "greedy_attack":
        decode = make_greedy_decode_attack(model, cfg, position_mode=pm,
                                           full_target=star)
        extra = (args.epsilon,)
    elif args.eval_mode == "greedy_gan":
        decode = make_greedy_decode_gan(model, cfg, position_mode=pm,
                                        full_target=star)
        extra = (args.epsilon,)
    else:  # teacher-forced eval with FGM or PGD attack
        if _is_gan(variant):
            # the GAN transceiver returns (pred_p, pred_r, tx, y_r) — its
            # teacher-forced FGM eval has its own step (reference
            # eval_step_FGM); PGD is not defined for it in the reference
            from deepsc_gan_tpu.train.gan_steps import make_gan_eval_step
            step = make_gan_eval_step(model, cfg, full_target=star)
        elif args.eval_mode == "pgd":
            from deepsc_gan_tpu.train.steps import make_eval_step_pgd
            step = make_eval_step_pgd(model, cfg, full_target=star)
        else:
            step = make_eval_step(model, cfg, full_target=star)
        # reference eval.pkl protocol: the predictions are SCORED, not just
        # the losses (utlis/eval.py:189-232). Rows:
        # [snr, clean_metric..., attacked_metric..., loss_clean, loss_att]
        from deepsc_gan_tpu.evaluate.evaluator import teacher_forced_sweep
        table = teacher_forced_sweep(
            step, state, batches, vocab, cfg, snrs=snrs,
            pnr_db=args.pnr_db, epsilon=args.epsilon, key=key,
            metric=args.metric)
        for row in table:
            print(f"SNR={row[0]:.0f}dB metrics(clean|attacked)="
                  + " ".join(f"{m:.4f}" for m in row[1:-2])
                  + f" loss={row[-2]:.4f}/{row[-1]:.4f}")
        save_result_table(table, os.path.join(cfg.log_save_path,
                                              f"eval-{variant}.pkl"))
        return

    table = snr_sweep_bleu(decode, state.params, batches, vocab, cfg,
                           snrs=snrs, pnr_db=args.pnr_db, key=key,
                           decode_extra_args=extra, metric=args.metric)
    for snr, *ms in table:
        print(f"SNR={snr:.0f}dB " + " ".join(f"{m:.4f}" for m in ms))
    save_result_table(table, os.path.join(
        cfg.log_save_path, f"test-{variant}-{args.eval_mode}.pkl"))


def cmd_transmit(args) -> None:
    """Send user text through the full system: tokenize -> semantic+channel
    encode -> noisy channel at --snr -> decode -> print the received
    sentence (the end-to-end demo the reference never shipped — its
    pipeline only ran inside training/eval loops)."""
    import numpy as np

    from deepsc_gan_tpu.data.preprocess import (
        PUNCT_TO_KEEP,
        PUNCT_TO_REMOVE,
        normalize_string,
        tokenize,
    )
    from deepsc_gan_tpu.data.vocab import SeqToText
    from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode
    from deepsc_gan_tpu.evaluate.metrics import SNR_to_noise

    cfg = _variant_config(args)
    variant = args.variant
    pm = _position_mode(variant)
    model = make_model(cfg, variant)
    init_kw = {"traingan": True} if _is_gan(variant) else {}
    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed),
                               **init_kw)
    state = _restore_latest(cfg, variant, state, tag="transmit")
    vocab = _load_vocab(cfg)

    texts = args.text if args.text else [l.strip() for l in sys.stdin
                                         if l.strip()]
    if not texts:
        raise SystemExit("transmit: no input sentences (pass --text or "
                         "pipe non-empty lines on stdin)")
    rows = []
    for t in texts:
        toks = tokenize(normalize_string(t), punct_to_keep=PUNCT_TO_KEEP,
                        punct_to_remove=PUNCT_TO_REMOVE)
        ids = vocab.encode(toks)[: cfg.seq_len]
        rows.append(ids + [cfg.pad_idx] * (cfg.seq_len - len(ids)))
    inp = np.asarray(rows, dtype=np.int32)

    decode = make_greedy_decode(model, cfg, position_mode=pm)
    out = decode(state.params, inp, jax.random.PRNGKey(args.seed),
                 args.pnr_db, float(SNR_to_noise(args.snr)))
    s2t = SeqToText(vocab, cfg.end_idx)
    for t, row_in, row_out in zip(texts, inp, np.asarray(out)):
        ids_out = [int(i) for i in row_out]
        if ids_out and ids_out[0] == cfg.start_idx:
            ids_out = ids_out[1:]
        sent = s2t.sequence_to_text(ids_out)
        print(f"tx[{args.snr:g}dB]> {t}")
        print(f"rx[{args.snr:g}dB]> {sent}")


def cmd_export(args) -> None:
    """Serialize the decode SNR sweep as a self-contained StableHLO
    artifact (jax.export): weights baked in as constants, callable from
    any JAX (or StableHLO-consuming) runtime without this package —
    `export.deserialize(blob).call(inp, seed, pnr_db, n_stds)`. The
    deployment story the reference (a notebook codebase) never had; the
    reference workload being deployed is its serving loop
    (utlis/eval.py:99-115).

    The artifact contains the PRODUCTION serving path: the KV-cached
    greedy decoder for autoregressive variants (O(L) stack passes —
    6.8x the full-prefix export's throughput, RESULTS.md "Serving
    export"), the single-pass one-shot decode for star variants, or the
    KV-cached beam search (--decoder beam, scored through the portable
    XLA scorer since a Pallas custom call does not serialize across
    runtimes). --decoder full keeps the full-prefix oracle."""
    from jax import export as jexport

    cfg = _variant_config(args)
    variant = args.variant
    pm = _position_mode(variant)
    model = make_model(cfg, variant)
    init_kw = {"traingan": True} if _is_gan(variant) else {}
    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed),
                               **init_kw)
    state = _restore_latest(cfg, variant, state, tag="export")

    decoder = args.decoder
    if decoder == "auto":
        # serving default: KV cache where the decoder is autoregressive,
        # the (already single-pass) one-shot sweep for star codecs
        decoder = "kv" if pm == "step" else "full"
    if decoder in ("kv", "beam") and pm != "step":
        raise SystemExit(f"--decoder {decoder} requires an autoregressive "
                         "decoder (vanilla transformer/gan); star decoders "
                         "are non-autoregressive — their one-shot sweep IS "
                         "the serving path (--decoder auto/full)")
    restore_mode = None
    if decoder == "kv":
        from deepsc_gan_tpu.evaluate.kv_decode import (
            make_greedy_decode_kv_sweep)
        sweep = make_greedy_decode_kv_sweep(model, cfg)
    elif decoder == "beam":
        from deepsc_gan_tpu.evaluate.beam import make_beam_decode_sweep
        from deepsc_gan_tpu.ops.pallas.topk import (
            set_topk_kernel_mode, topk_kernel_mode)
        restore_mode = topk_kernel_mode()
        set_topk_kernel_mode("xla")  # portable scorer inside the artifact
        sweep = make_beam_decode_sweep(model, cfg, beam_size=args.beam_size)
    else:
        from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
        sweep = make_greedy_decode_sweep(model, cfg, position_mode=pm)
    params = state.params

    def serve(inp, seed, pnr_db, n_stds):
        return sweep(params, inp, jax.random.PRNGKey(seed), pnr_db, n_stds)

    import jax.numpy as jnp
    if args.static_shapes:
        # pinned signature (for StableHLO consumers without dynamic-dim
        # support): batch = cfg.bs, sweep length = --snr-points
        ex_inp = jnp.zeros((cfg.bs, cfg.seq_len), jnp.int32)
        ex_nstd = jnp.ones((args.snr_points,), jnp.float32)
        b_str, s_str = str(cfg.bs), str(args.snr_points)
    else:
        # symbolic batch + sweep length (jax.export shape polymorphism):
        # ONE artifact serves any batch size and any SNR-point count
        b_sym, s_sym = jexport.symbolic_shape("b, s")
        ex_inp = jax.ShapeDtypeStruct((b_sym, cfg.seq_len), jnp.int32)
        ex_nstd = jax.ShapeDtypeStruct((s_sym,), jnp.float32)
        b_str, s_str = "b", "s"
    ex_seed = jax.ShapeDtypeStruct((), jnp.int32)
    ex_pnr = jax.ShapeDtypeStruct((), jnp.float32)
    # the artifact must stay portable StableHLO: trace the encoder's
    # attention through the XLA einsum path, not the Mosaic custom call
    # the fused kernel emits (same reason as the beam scorer above)
    from deepsc_gan_tpu.ops.pallas.attention import (
        attn_kernel_mode as _akm,
        set_attn_kernel_mode,
    )
    restore_attn = _akm()
    set_attn_kernel_mode("xla")
    try:
        exp = jexport.export(jax.jit(serve))(ex_inp, ex_seed, ex_pnr,
                                             ex_nstd)
        blob = exp.serialize()
    finally:
        set_attn_kernel_mode(restore_attn)
    if restore_mode is not None:
        from deepsc_gan_tpu.ops.pallas.topk import set_topk_kernel_mode
        set_topk_kernel_mode(restore_mode)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(blob)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"[export] {args.out}: {len(blob) / 1e6:.1f} MB, "
          f"{n_params:,} params baked in, "
          f"signature (inp[{b_str},{cfg.seq_len}] i32, seed i32, "
          f"pnr_db f32, n_stds[{s_str}] f32) -> ids")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="deepsc_gan_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("preprocess", help="Europarl preprocessing")
    pp.add_argument("--input-data-dir", default="data/txt/en")
    pp.add_argument("--output-train-dir", default="data/txt/train_data.pkl")
    pp.add_argument("--output-test-dir", default="data/txt/test_data.pkl")
    pp.add_argument("--output-vocab", default="data/txt/vocab.json")

    bl = sub.add_parser(
        "baseline",
        help="classical Huffman+Turbo+QAM BLEU-vs-SNR sweep (the "
             "reference's MATLAB-artifact-only pipeline, in code)")
    bl.add_argument("--data", required=True,
                    help="pickle of raw sentences (e.g. the reference's "
                         "common/data/data.pkl)")
    bl.add_argument("--out", default="log/classical-log.pkl")
    bl.add_argument("--block-k", type=int, default=512)
    bl.add_argument("--iters", type=int, default=6)
    bl.add_argument("--mod-bits", type=int, default=6, help="6 = 64-QAM")
    bl.add_argument("--baseline-pnr-db", type=float, default=10.0)
    bl.add_argument("--snrs", default=",".join(str(s) for s in range(19)))
    bl.add_argument("--baseline-seed", type=int, default=0)

    for name in ("train", "evaluate"):
        p = sub.add_parser(name)
        add_config_args(p)
        p.add_argument("--variant", default="transformer",
                       choices=["transformer", "star", "star_multi", "gan",
                                "gan_star"])
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--pnr-db", type=float, default=0.0)
        p.add_argument("--epsilon", type=float, default=1.0)
        if name == "train":
            p.add_argument("--train-mode", default="plain",
                           choices=["plain", "attack", "gan", "mine"])
            p.add_argument("--adv-weight", type=float, default=1.0,
                           help="attack mode: w*adv + (1-w)*clean loss")
            p.add_argument("--log-every", type=int, default=10)
            p.add_argument("--scan-steps", type=int, default=32,
                           help="plain mode: train steps fused per dispatch "
                                "via lax.scan (1 = single-step dispatch)")
            p.add_argument("--distributed", action="store_true",
                           help="multi-host: jax.distributed.initialize "
                                "before building the mesh")
            p.add_argument("--ckpt-every", type=int, default=10,
                           help="checkpoint every N epochs (the final epoch "
                                "always saves)")
            p.add_argument("--resume", action="store_true",
                           help="continue from the latest epoch checkpoint "
                                "(params + Adam moments + step + EMA; "
                                "bit-identical to the uninterrupted run). "
                                "mine mode: the MINE statistics net "
                                "restarts fresh")
            p.add_argument("--profile", default=None, metavar="DIR",
                           help="capture a jax.profiler device trace of the "
                                "first epoch into DIR (TensorBoard-viewable)")
        else:
            p.add_argument("--eval-mode", default="greedy",
                           choices=["greedy", "beam", "greedy_attack",
                                    "greedy_gan", "teacher_forced", "pgd"])
            p.add_argument("--beam-size", type=int, default=4)
            p.add_argument("--beam-impl", default="kv",
                           choices=["kv", "full"],
                           help="beam mode: KV-cached serving path "
                                "(default) or the full-prefix oracle")
            p.add_argument("--kv-cache", action="store_true",
                           help="greedy mode: KV-cached decode (O(L) "
                                "projections instead of O(L^2); "
                                "token-identical at f32)")
            p.add_argument("--metric", default="bleu",
                           choices=["bleu", "similarity", "both"],
                           help="text metric column(s) in the result table "
                                "(similarity: BERT when local weights "
                                "exist, else unigram-cosine fallback)")
            p.add_argument("--eval-batches", type=int, default=8)
            p.add_argument("--snr-lo", type=int, default=0)
            p.add_argument("--snr-hi", type=int, default=18)
            p.add_argument("--snr-parallel", type=int, default=1,
                           help="greedy mode: shard the SNR sweep axis "
                                "over this many devices (must divide the "
                                "SNR point count)")

    tx = sub.add_parser(
        "transmit",
        help="send text through the trained transceiver at a chosen SNR "
             "and print what the receiver decodes")
    add_config_args(tx)
    tx.add_argument("--variant", default="transformer",
                    choices=["transformer", "star", "star_multi", "gan",
                                "gan_star"])
    tx.add_argument("--seed", type=int, default=0)
    tx.add_argument("--snr", type=float, default=6.0)
    tx.add_argument("--pnr-db", type=float, default=0.0)
    tx.add_argument("--text", action="append",
                    help="sentence to transmit (repeatable; default: read "
                         "lines from stdin)")

    ex = sub.add_parser(
        "export",
        help="serialize the serving decode sweep (weights baked in) as a "
             "self-contained StableHLO artifact via jax.export — KV-cached "
             "greedy by default (--decoder)")
    add_config_args(ex)
    ex.add_argument("--variant", default="transformer",
                    choices=["transformer", "star", "star_multi", "gan",
                                "gan_star"])
    ex.add_argument("--seed", type=int, default=0)
    ex.add_argument("--decoder", default="auto",
                    choices=["auto", "kv", "beam", "full"],
                    help="serving path inside the artifact: auto = "
                         "KV-cached greedy for autoregressive variants / "
                         "one-shot sweep for star; kv = KV-cached greedy; "
                         "beam = KV-cached beam search (portable XLA "
                         "scorer); full = full-prefix oracle decoder")
    ex.add_argument("--beam-size", type=int, default=4,
                    help="--decoder beam: beam width")
    ex.add_argument("--snr-points", type=int, default=19,
                    help="sweep length for --static-shapes (the default "
                         "artifact takes any length — and any batch — "
                         "via symbolic dims)")
    ex.add_argument("--static-shapes", action="store_true",
                    help="pin batch (= --bs) and sweep length in the "
                         "signature instead of exporting symbolic dims")
    ex.add_argument("--out", default="model_decode.stablehlo")

    args = parser.parse_args(argv)
    if args.cmd == "preprocess":
        from deepsc_gan_tpu.data.preprocess import main as pp_main
        pp_main(["--input-data-dir", args.input_data_dir,
                 "--output-train-dir", args.output_train_dir,
                 "--output-test-dir", args.output_test_dir,
                 "--output-vocab", args.output_vocab])
    elif args.cmd == "baseline":
        import pickle

        from deepsc_gan_tpu.baselines.pipeline import classical_sweep

        with open(args.data, "rb") as f:
            sentences = pickle.load(f)
        rows = classical_sweep(
            sentences, [float(s) for s in args.snrs.split(",")],
            block_k=args.block_k, iters=args.iters,
            mod_bits=args.mod_bits, pnr_db=args.baseline_pnr_db,
            seed=args.baseline_seed)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "wb") as f:
            pickle.dump(rows, f)
        print(f"wrote {args.out}")
    elif args.cmd == "train":
        # cmd_train/cmd_evaluate flip the module-level Pallas-kernel
        # switches (mode for snr-parallel eval, mesh registration for
        # dp/tp training); restore them on exit so in-process callers
        # (tests, notebooks) don't inherit stale state
        with _kernel_switch_guard():
            cmd_train(args)
    elif args.cmd == "transmit":
        cmd_transmit(args)
    elif args.cmd == "export":
        cmd_export(args)
    else:
        with _kernel_switch_guard():
            cmd_evaluate(args)


if __name__ == "__main__":
    main()
