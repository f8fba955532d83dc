"""Benchmark: training throughput of the flagship model at reference scale.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric: teacher-forced training throughput in sentences/sec/chip for the
vanilla DeepSC transceiver at the reference's published scale
(d_model=128, 4+4 layers, 8 heads, dff=512, vocab=22,234, L=31, B=64 —
DeepSC-GAN/utlis/parameters.py:20-54), AWGN channel, Adam — i.e. the
reference's `train_step_noattack` workload.

vs_baseline: ratio against REFERENCE_SENTS_PER_SEC — an ESTIMATE of the
TF2 reference's single-GPU throughput (its hardware is unstated —
SURVEY.md §6; the JSON carries vs_baseline_is_estimate=true). Estimate:
unfused TF2 eager-traced Keras at batch 64, ~7M params => ~25ms/step on a
V100-class card => ~2,500 sentences/sec. BASELINE.md target: >=5x/chip.

Also reported (anchors the ratio to hardware truth):
  flops_per_step — XLA cost analysis of the compiled program, per train
                   step (fwd+bwd+Adam);
  mfu            — achieved FLOP/s over the v5e peak (197 TFLOP/s bf16).
                   At B=64 the model is dispatch/HBM-bound, so MFU is
                   small by design — the batch_scaling rows (use
                   --scaling) show where compute-bound begins.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the TPU may compile remotely (30-300s for the
# scan program); repeat bench runs should hit the cache
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_SENTS_PER_SEC = 2500.0
V5E_PEAK_FLOPS = 197e12  # bf16 per chip
V5E_HBM_BYTES_PER_SEC = 819e9  # per chip


def bench_batch(batch_size: int, scan_k: int, steps: int, reps: int,
                warmup: int, dtype: str, cfg=None):
    """-> (sents_per_sec, flops_per_step, bytes_per_step); the
    cost-analysis fields are None if the backend does not expose them.
    `cfg` overrides the reference-scale default (used by --model-scale)."""
    from deepsc_gan_tpu.data.loader import synthetic_dataset
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_train_multi_step,
    )
    from deepsc_gan_tpu.utils.config import Config

    if cfg is None:
        cfg = Config(bs=batch_size, dtype=dtype)
    model = make_model(cfg, "transformer")
    from deepsc_gan_tpu.train.steps import make_step_key
    key = make_step_key(cfg, 0)
    state = create_train_state(model, cfg, key)
    # the framework's fast path: K train steps per dispatch via lax.scan
    # (bit-identical sequential Adam semantics; amortizes host->device
    # dispatch, which dominates at small batch)
    mstep = make_train_multi_step(model, cfg, donate=False)

    ds = synthetic_dataset(n=batch_size * scan_k, seq_len=cfg.seq_len,
                           vocab_size=cfg.vocab_size,
                           batch_size=batch_size, seed=0)
    batch = jnp.asarray(np.stack([b for b, _ in ds], axis=0))  # (K, B, L)

    # XLA cost analysis counts a lax.scan BODY once, independent of the
    # trip count (verified: the reported totals are invariant to K) — so
    # the program's "flops"/"bytes accessed" ARE the per-step costs.
    flops = bytes_accessed = None
    try:
        compiled = mstep.lower(state, batch, batch, key,
                               jnp.asarray(0.1)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and "flops" in ca:
            flops = float(ca["flops"])
        if ca and "bytes accessed" in ca:
            bytes_accessed = float(ca["bytes accessed"])
    except Exception:
        pass

    for _ in range(max(1, warmup)):  # >=1: binds `losses` for the sync
        key, sub = jax.random.split(key)
        state, losses = mstep(state, batch, batch, sub, 0.1)
    float(losses.sum())  # true sync (device->host readback)

    # best-of-N repetitions: the TPU may sit behind a shared tunnel whose
    # load varies; the least-contended rep is closest to hardware truth
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, losses = mstep(state, batch, batch, sub, 0.1)
        float(losses.sum())
        best = min(best, time.perf_counter() - t0)

    return steps * scan_k * batch_size / best, flops, bytes_accessed


def bench_decode(batch_size: int, dtype: str, mode: str, snr_points: int,
                 reps: int, warmup: int, beam_size: int = 4):
    """Decode (serving) throughput: decoded sequences/sec across a fused
    SNR sweep (one dispatch covers snr_points noise levels x B sentences,
    30 autoregressive steps each — the reference decodes the same
    workload with a Python loop re-running the full decoder stack per
    token, utlis/eval.py:99-115). Modes: greedy "full"/"kv" (full-prefix
    vs KV-cached) and "beam_full"/"beam_kv" (beam_size hypotheses)."""
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import create_train_state
    from deepsc_gan_tpu.utils.config import Config

    cfg = Config(bs=batch_size, dtype=dtype)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    if mode == "kv":
        from deepsc_gan_tpu.evaluate.kv_decode import (
            make_greedy_decode_kv_sweep)
        sweep = make_greedy_decode_kv_sweep(model, cfg)
    elif mode == "full":
        from deepsc_gan_tpu.evaluate.greedy import make_greedy_decode_sweep
        sweep = make_greedy_decode_sweep(model, cfg)
    elif mode == "beam_kv":
        from deepsc_gan_tpu.evaluate.beam import make_beam_decode_sweep
        sweep = make_beam_decode_sweep(model, cfg, beam_size=beam_size)
    else:  # beam_full: the O(L^2) full-prefix beam, vmapped over SNR
        from deepsc_gan_tpu.evaluate.beam import make_beam_decode
        decode = make_beam_decode(model, cfg, beam_size=beam_size)

        @jax.jit
        def sweep(params, inp, key, pnr_db, n_stds):
            keys = jax.random.split(key, n_stds.shape[0])
            return jax.vmap(decode, in_axes=(None, None, 0, None, 0))(
                params, inp, keys, pnr_db, n_stds)

    inp = jax.random.randint(jax.random.PRNGKey(1),
                             (batch_size, cfg.seq_len), 0, cfg.vocab_size,
                             jnp.int32)
    n_stds = jnp.linspace(0.11, 1.0, snr_points)
    key = jax.random.PRNGKey(2)
    for _ in range(max(1, warmup)):  # >=1: binds `ids` for the sync
        ids = sweep(state.params, inp, key, 0.0, n_stds)
    int(np.asarray(ids[0, 0, 0]))  # sync

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ids = sweep(state.params, inp, key, 0.0, n_stds)
        int(np.asarray(ids[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    return batch_size * snr_points / best


def bench_export_decode(batch_size: int, dtype: str, snr_points: int,
                        reps: int, warmup: int):
    """Serving throughput THROUGH THE EXPORT ARTIFACT: serialize the
    KV-cached greedy sweep with jax.export (symbolic batch/SNR dims — the
    `cli export` artifact), deserialize it, and time `.call` on the same
    workload as bench_decode. This is what a deployment runtime actually
    gets; VERDICT r4 item 1's done-criterion is that this matches the
    in-process KV path (~25k seq/s) instead of the old full-prefix
    export's 3.8k."""
    from jax import export as jexport

    from deepsc_gan_tpu.evaluate.kv_decode import make_greedy_decode_kv_sweep
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.train.steps import create_train_state
    from deepsc_gan_tpu.utils.config import Config

    cfg = Config(bs=batch_size, dtype=dtype)
    model = make_model(cfg, "transformer")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    sweep = make_greedy_decode_kv_sweep(model, cfg)
    params = state.params

    def serve(inp, seed, pnr_db, n_stds):
        return sweep(params, inp, jax.random.PRNGKey(seed), pnr_db, n_stds)

    b_sym, s_sym = jexport.symbolic_shape("b, s")
    # portable artifact: XLA einsum attention, not the Mosaic custom
    # call (mirrors cli export)
    from deepsc_gan_tpu.ops.pallas.attention import (
        attn_kernel_mode,
        set_attn_kernel_mode,
    )
    restore_attn = attn_kernel_mode()
    set_attn_kernel_mode("xla")
    try:
        exp = jexport.export(jax.jit(serve))(
            jax.ShapeDtypeStruct((b_sym, cfg.seq_len), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((s_sym,), jnp.float32))
        blob = exp.serialize()
    finally:
        set_attn_kernel_mode(restore_attn)
    art = jexport.deserialize(blob)

    inp = jax.random.randint(jax.random.PRNGKey(1),
                             (batch_size, cfg.seq_len), 0, cfg.vocab_size,
                             jnp.int32)
    n_stds = jnp.linspace(0.11, 1.0, snr_points)
    call = jax.jit(art.call)
    for _ in range(max(1, warmup)):
        ids = call(inp, jnp.int32(2), jnp.float32(0.0), n_stds)
    int(np.asarray(ids[0, 0, 0]))  # sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ids = call(inp, jnp.int32(2), jnp.float32(0.0), n_stds)
        int(np.asarray(ids[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    return {"artifact_mb": round(len(blob) / 1e6, 1),
            "seqs_per_sec": round(batch_size * snr_points / best, 1)}


def bench_qkv_ab(batch: int, scan_k: int, steps: int, reps: int,
                 warmup: int, dtype: str):
    """Packed-QKV A/B (VERDICT r4 item 4): the same train step traced with
    separate wq/wk/wv matmuls vs ONE packed (D, 3*H*Dh) contraction per
    self-attention (K/V pair-packed in cross-attention) — identical param
    tree, identical math (ops/attention.py:set_qkv_fusion). Measured at
    the flagship shape and at the d256 profile shape whose 12.4 ms
    'data formatting' bucket motivated the lever
    (results/profile_d256.json)."""
    from deepsc_gan_tpu.ops.attention import set_qkv_fusion
    from deepsc_gan_tpu.utils.config import Config

    d256 = dict(bs=512, dtype=dtype, rng_impl="rbg",
                encoder_d_model=256, decoder_d_model=256,
                encoder_d_ff=1024, decoder_d_ff=1024,
                encoder_num_layer=6, decoder_num_layer=6)
    shapes = {
        "flagship": (Config(bs=batch, dtype=dtype), batch, scan_k, steps),
        "d256_B512": (Config(**d256), 512, 8, 2),
    }
    n_chips = max(jax.device_count(), 1)
    rows = {}
    try:
        for name, (cfg, b, k, st) in shapes.items():
            row = {}
            for fuse in (False, True):
                set_qkv_fusion(fuse)
                sps, _, _ = bench_batch(b, k, st, reps, warmup, dtype,
                                        cfg=cfg)
                row["packed" if fuse else "separate"] = round(
                    sps / n_chips, 1)
            row["packed_speedup"] = round(row["packed"] / row["separate"],
                                          4)
            rows[name] = row
    finally:
        set_qkv_fusion(False)
    return rows


def bench_attn_ab(batch: int, scan_k: int, steps: int, reps: int,
                  warmup: int, dtype: str):
    """Head-layout A/B (the d256 copy-bucket lever after packed QKV was
    rejected): the same train step traced with the default (B,L,H,Dh)
    attention layout vs (B,H,L,Dh) projections that keep the whole
    logits->softmax->context chain layout-consistent
    (ops/attention.py:set_head_layout) — identical param tree, identical
    math. Measured at the flagship shape and at the d256 profile shape
    whose 12.5 ms/step `copy` family motivated the lever
    (results/profile_d256_r5.json)."""
    from deepsc_gan_tpu.ops.attention import set_head_layout
    from deepsc_gan_tpu.utils.config import Config

    d256 = dict(bs=512, dtype=dtype, rng_impl="rbg",
                encoder_d_model=256, decoder_d_model=256,
                encoder_d_ff=1024, decoder_d_ff=1024,
                encoder_num_layer=6, decoder_num_layer=6)
    shapes = {
        "flagship": (Config(bs=batch, dtype=dtype), batch, scan_k, steps),
        "d256_B512": (Config(**d256), 512, 8, 2),
    }
    n_chips = max(jax.device_count(), 1)
    rows = {}
    try:
        for name, (cfg, b, k, st) in shapes.items():
            row = {}
            for layout in ("blhd", "bhld"):
                set_head_layout(layout)
                sps, _, _ = bench_batch(b, k, st, reps, warmup, dtype,
                                        cfg=cfg)
                row[layout] = round(sps / n_chips, 1)
            row["bhld_speedup"] = round(row["bhld"] / row["blhd"], 4)
            rows[name] = row
    finally:
        set_head_layout("blhd")
    return rows


def bench_attn_kernel_ab(batch: int, scan_k: int, steps: int, reps: int,
                         warmup: int, dtype: str):
    """Fused-attention-kernel A/B (the d256 copy-bucket lever after the
    three layout A/Bs were rejected): the same train step traced with
    the XLA einsum attention vs the fused Pallas kernel
    (ops/pallas/attention.py — 3-D lane-aligned I/O, heads split in
    VMEM, custom-VJP backward), identical param tree and math. Measured
    at the flagship shape and at the d256 profile shape whose 12.5
    ms/step `copy` family is the target
    (results/profile_d256_r5.json)."""
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode
    from deepsc_gan_tpu.utils.config import Config

    d256 = dict(bs=512, dtype=dtype, rng_impl="rbg",
                encoder_d_model=256, decoder_d_model=256,
                encoder_d_ff=1024, decoder_d_ff=1024,
                encoder_num_layer=6, decoder_num_layer=6)
    shapes = {
        "flagship": (Config(bs=batch, dtype=dtype), batch, scan_k, steps),
        "d256_B512": (Config(**d256), 512, 8, 2),
    }
    n_chips = max(jax.device_count(), 1)
    rows = {}
    try:
        for name, (cfg, b, k, st) in shapes.items():
            row = {}
            for mode in ("xla", "pallas"):
                set_attn_kernel_mode(mode)
                sps, _, _ = bench_batch(b, k, st, reps, warmup, dtype,
                                        cfg=cfg)
                row[mode] = round(sps / n_chips, 1)
            row["pallas_speedup"] = round(row["pallas"] / row["xla"], 4)
            rows[name] = row
    finally:
        set_attn_kernel_mode("xla")
    return rows


def bench_decode_attn_ab(batch: int, dtype: str, reps: int, warmup: int):
    """Fused-attention-kernel A/B on the DECODE (serving) path: the
    greedy full-prefix sweep re-runs the decoder stack per generated
    token (30 autoregressive steps x 19 SNR points), so its attention
    mix is heavier than one train step; the KV-cached sweep only hits
    MultiHeadAttention in the encoder prefill (its per-token decode
    attention reads cached K/V directly in evaluate/kv_decode.py).
    Same A/B protocol as bench_attn_kernel_ab, through bench_decode."""
    from deepsc_gan_tpu.ops.pallas.attention import set_attn_kernel_mode

    n_chips = max(jax.device_count(), 1)
    rows = {}
    try:
        for name, mode in (("greedy_full", "full"), ("greedy_kv", "kv")):
            row = {}
            for kmode in ("xla", "pallas"):
                set_attn_kernel_mode(kmode)
                sps = bench_decode(batch, dtype, mode, 19, reps, warmup)
                row[kmode] = round(sps / n_chips, 1)
            row["pallas_speedup"] = round(row["pallas"] / row["xla"], 4)
            rows[name] = row
    finally:
        set_attn_kernel_mode("auto")
    return rows


def bench_star(batch_size: int, scan_k: int, steps: int, reps: int,
               warmup: int, dtype: str, mode: str):
    """Star-variant (SE/SD) training throughput with the satellite-update
    kernel pinned to `mode` ("pallas" or "xla") — measures what the fused
    Pallas kernel is actually worth on hardware."""
    from deepsc_gan_tpu.data.loader import synthetic_dataset
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.ops.pallas.star import set_star_kernel_mode
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_train_multi_step,
    )
    from deepsc_gan_tpu.utils.config import Config, default_seq_len

    set_star_kernel_mode(mode)
    try:
        # star's lane-aligned length is 31 (relay row makes 32 —
        # utils/config.py:default_seq_len; results/star_seq_ab_r4.json)
        cfg = Config(bs=batch_size, dtype=dtype,
                     seq_len=default_seq_len("star"))
        model = make_model(cfg, "star")
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, cfg, key)
        mstep = make_train_multi_step(model, cfg, donate=False,
                                      full_target=True)
        ds = synthetic_dataset(n=batch_size * scan_k, seq_len=cfg.seq_len,
                               vocab_size=cfg.vocab_size,
                               batch_size=batch_size, seed=0)
        batch = jnp.asarray(np.stack([b for b, _ in ds], axis=0))
        for _ in range(max(1, warmup)):  # >=1: binds `losses`
            key, sub = jax.random.split(key)
            state, losses = mstep(state, batch, batch, sub, 0.1)
        float(losses.sum())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(steps):
                key, sub = jax.random.split(key)
                state, losses = mstep(state, batch, batch, sub, 0.1)
            float(losses.sum())
            best = min(best, time.perf_counter() - t0)
        return steps * scan_k * batch_size / best
    finally:
        set_star_kernel_mode("auto")


def bench_model_scale(d_model: int, layers: int, batch: int, scan_k: int,
                      steps: int, reps: int, warmup: int, dtype: str):
    """Compute-bound scaling row: a d_model-wide 6+6-layer variant of the
    same transceiver family (the capacity-ablation models, RESULTS.md) at
    large batch, through the SAME make_train_multi_step path — the shape
    where the MXU, not dispatch/HBM, should bind. Returns the row dict."""
    from deepsc_gan_tpu.utils.config import Config

    # rbg RNG: at this scale threefry dropout-mask generation is ~45% of
    # the step (results/profile_d256.json) — rbg is the production choice
    cfg = Config(
        bs=batch, dtype=dtype, rng_impl="rbg",
        encoder_d_model=d_model, decoder_d_model=d_model,
        encoder_d_ff=4 * d_model, decoder_d_ff=4 * d_model,
        encoder_num_layer=layers, decoder_num_layer=layers)
    sps, flops, hbm = bench_batch(batch, scan_k, steps, reps, warmup,
                                  dtype, cfg=cfg)
    n_chips = max(jax.device_count(), 1)
    per_chip = sps / n_chips
    row = {"sents_per_sec": round(per_chip, 1),
           "step_time_ms": round(1e3 * batch / per_chip, 3)}
    if flops:
        row["flops_per_step"] = round(flops)
        row["mfu"] = round(flops * per_chip / batch / V5E_PEAK_FLOPS, 4)
    if hbm:
        row["hbm_roofline_ms"] = round(1e3 * hbm / V5E_HBM_BYTES_PER_SEC, 3)
    return row


def bench_seq_ab(batch: int, scan_k: int, steps: int, reps: int,
                 warmup: int, dtype: str, d_model: int = 128):
    """Sequence-length layout A/B (VERDICT r3 item 3): L=31 (the
    reference's padded length — LANE-MISALIGNED on the TPU's 128-lane /
    8-sublane vector layout; the d256 profile attributes ~20% of step
    time to data-formatting copies from the (B, H, 31, 31) attention
    tensors, results/profile_d256.json) vs L=32 (pad one extra PAD
    column; masks already handle it). Same train-step path, same batch;
    the L=32 variant does ~3% more token math — included in the
    sentences/sec comparison, which is the honest end-to-end criterion.
    `d_model` > 128 reproduces the profile's d256 shape (6+6 layers,
    rbg RNG, as bench_model_scale)."""
    from deepsc_gan_tpu.utils.config import Config

    rows = {}
    for L in (31, 32):
        if d_model == 128:
            cfg = Config(bs=batch, dtype=dtype, seq_len=L)
        else:
            cfg = Config(
                bs=batch, dtype=dtype, seq_len=L, rng_impl="rbg",
                encoder_d_model=d_model, decoder_d_model=d_model,
                encoder_d_ff=4 * d_model, decoder_d_ff=4 * d_model,
                encoder_num_layer=6, decoder_num_layer=6)
        sps, flops, hbm = bench_batch(batch, scan_k, steps, reps, warmup,
                                      dtype, cfg=cfg)
        per_chip = sps / max(jax.device_count(), 1)
        rows[f"L{L}"] = {
            "sents_per_sec": round(per_chip, 1),
            "step_time_ms": round(1e3 * batch / per_chip, 3),
            **({"flops_per_step": round(flops)} if flops else {}),
            **({"hbm_roofline_ms":
                round(1e3 * hbm / V5E_HBM_BYTES_PER_SEC, 3)} if hbm
               else {}),
        }
    rows["pad32_speedup"] = round(
        rows["L32"]["sents_per_sec"] / rows["L31"]["sents_per_sec"], 4)
    return rows


def bench_ce_ab(batch: int, dtype: str, reps: int, warmup: int):
    """Isolated three-way A/B of the CE implementations at a shape where
    the kernel path DISPATCHES (rows >= 4096, ops/fused_ce.py gate):
    value+grad of the mean CE at N=batch*30 rows, reference (D=128,
    V=22234). `hybrid` (Pallas fwd + scan bwd) is the production path at
    this row count; `pallas` is the all-kernel variant kept for the
    interpret-mode test harness."""
    import numpy as np

    from deepsc_gan_tpu.ops.fused_ce import (
        fused_softmax_xent,
        hybrid_softmax_xent,
    )
    from deepsc_gan_tpu.ops.pallas.ce import pallas_softmax_xent

    d, v = 128, 22234
    n = batch * 30
    key = jax.random.PRNGKey(0)
    dt = jnp.dtype(dtype)
    h = jax.random.normal(key, (n, d), jnp.float32).astype(dt)
    W = (jax.random.normal(jax.random.PRNGKey(1), (d, v), jnp.float32)
         * 0.05)
    b = jnp.zeros((v,), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, v,
                                jnp.int32)

    def timed(fn, chain=10):
        # chain async dispatches and sync ONCE per timing: one call per
        # rep measures mostly per-dispatch overhead (the first run of
        # this A/B read ~28 ms for what is a ~4 ms op)
        g = jax.jit(jax.grad(
            lambda h, W, b: jnp.mean(fn(h, W, b, labels)),
            argnums=(0, 1, 2)))
        for _ in range(max(1, warmup)):
            out = g(h, W, b)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(chain):
                out = g(h, W, b)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / chain)
        return 1e3 * best

    hybrid_ms = timed(lambda h, W, b, l=labels: hybrid_softmax_xent(
        h, W, b, l))
    pallas_ms = timed(lambda h, W, b, l=labels: pallas_softmax_xent(
        h, W, b, l))
    scan_ms = timed(lambda h, W, b, l=labels: fused_softmax_xent(
        h, W, b, l, 2048))
    return {"rows": n, "hybrid_ms": round(hybrid_ms, 3),
            "pallas_ms": round(pallas_ms, 3),
            "scan_ms": round(scan_ms, 3),
            "hybrid_speedup_vs_scan": round(scan_ms / hybrid_ms, 3),
            "production": "hybrid"}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=4,
                        help="multi-step dispatches per rep")
    parser.add_argument("--scan-steps", type=int, default=32,
                        help="train steps fused per dispatch (lax.scan K; "
                             "K=32 is the measured sweet spot — 16.8k "
                             "sents/s vs 15.5k at K=16, asymptote ~16.8k)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--scaling", action="store_true",
                        help="also measure B=256/1024 rows (extra compiles)")
    parser.add_argument("--star", action="store_true",
                        help="also A/B the star-satellite Pallas kernel "
                             "vs plain XLA on star-variant training")
    parser.add_argument("--decode", action="store_true",
                        help="also measure greedy-decode (serving) "
                             "throughput, full-prefix and KV-cached")
    parser.add_argument("--model-scale", action="store_true",
                        help="also measure compute-bound rows: d_model "
                             "256/512, 6+6 layers, dff=4d, B>=512, bf16 "
                             "(MFU demonstration; extra compiles)")
    parser.add_argument("--export-decode", action="store_true",
                        help="also measure serving throughput through the "
                             "jax.export artifact (the `cli export` "
                             "deployment path, KV-cached)")
    parser.add_argument("--decode-attn-ab", action="store_true",
                        help="A/B the fused Pallas attention on the "
                             "decode path (greedy full-prefix + KV "
                             "sweeps, xla vs pallas)")
    parser.add_argument("--attn-kernel-ab", action="store_true",
                        help="also A/B the XLA einsum attention vs the "
                             "fused Pallas attention kernel at flagship "
                             "and d256 shapes")
    parser.add_argument("--attn-ab", action="store_true",
                        help="also A/B the (B,L,H,Dh) vs (B,H,L,Dh) "
                             "attention head layouts at flagship and "
                             "d256 shapes")
    parser.add_argument("--qkv-ab", action="store_true",
                        help="also A/B separate vs packed QKV projections "
                             "at flagship and d256 shapes")
    parser.add_argument("--ce-ab", action="store_true",
                        help="also A/B the Pallas CE kernels vs the "
                             "lax.scan path at a dispatching shape")
    parser.add_argument("--seq-ab", action="store_true",
                        help="also A/B L=31 (reference, lane-misaligned) "
                             "vs L=32 (padded) at flagship scale")
    parser.add_argument("--seq-ab-d256", action="store_true",
                        help="the --seq-ab comparison at the d256 profile "
                             "shape (6+6 layers, B=512)")
    parser.add_argument("--backend-timeout", type=int, default=600,
                        help="seconds to wait for the backend (the TPU "
                             "may sit behind a tunnel that is down); on "
                             "expiry print an error JSON line instead of "
                             "hanging forever")
    args = parser.parse_args()

    # bounded backend probe: jax.devices() blocks indefinitely while the
    # tunnel is down — probe it in a daemon thread so a dead tunnel
    # yields a parseable error line rather than a hung process
    import threading

    probe: list = []
    th = threading.Thread(target=lambda: probe.append(jax.devices()),
                          daemon=True)
    th.start()
    th.join(args.backend_timeout)
    if not probe:
        print(json.dumps({
            "metric": "train_throughput_flagship", "value": 0.0,
            "unit": "sentences/sec/chip", "vs_baseline": 0.0,
            "error": f"backend unavailable after {args.backend_timeout}s "
                     "(TPU tunnel down) — no measurement",
        }))
        return

    sents_per_sec, flops, hbm_bytes = bench_batch(
        args.batch, args.scan_steps, args.steps, args.reps, args.warmup,
        args.dtype)
    n_chips = max(jax.device_count(), 1)
    per_chip = sents_per_sec / n_chips

    out = {
        "metric": "train_throughput_flagship",
        "value": round(per_chip, 1),
        "unit": "sentences/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_SENTS_PER_SEC, 3),
        "vs_baseline_is_estimate": True,
        "baseline_note": f"den={REFERENCE_SENTS_PER_SEC:.0f}/s estimated "
                         "V100 TF2 (reference hardware unstated)",
    }
    if flops:
        achieved = flops * per_chip / args.batch  # FLOP/step * steps/sec
        out["flops_per_step"] = round(flops)
        out["mfu_vs_v5e_bf16_peak"] = round(achieved / V5E_PEAK_FLOPS, 4)
    if hbm_bytes:
        # XLA's modeled bytes are PRE-FUSION (every op's operands/results
        # counted at HBM) — an upper bound on real traffic. Comparing the
        # no-fusion roofline time (modeled bytes / peak BW) against the
        # achieved step time shows how much traffic fusion elided; a
        # ratio > 1 means the step beats the un-fused HBM roofline.
        step_ms = 1e3 * args.batch / per_chip
        roofline_ms = 1e3 * hbm_bytes / V5E_HBM_BYTES_PER_SEC
        out["step_time_ms"] = round(step_ms, 3)
        out["hbm_bytes_modeled_per_step"] = round(hbm_bytes)
        out["unfused_hbm_roofline_ms"] = round(roofline_ms, 3)
        out["vs_unfused_roofline"] = round(roofline_ms / step_ms, 3)

    if args.star:
        modes = {}
        for mode in ("pallas", "xla"):
            modes[mode] = round(bench_star(
                args.batch, args.scan_steps, args.steps, args.reps,
                args.warmup, args.dtype, mode) / n_chips, 1)
        out["star_train_sents_per_sec"] = modes
        out["star_pallas_speedup"] = round(modes["pallas"] / modes["xla"],
                                           3)

    if args.decode:
        out["decode_sents_per_sec"] = round(
            bench_decode(args.batch, args.dtype, "full", 19, args.reps,
                         args.warmup) / n_chips, 1)
        out["decode_kv_sents_per_sec"] = round(
            bench_decode(args.batch, args.dtype, "kv", 19, args.reps,
                         args.warmup) / n_chips, 1)
        out["beam4_kv_sents_per_sec"] = round(
            bench_decode(args.batch, args.dtype, "beam_kv", 19, args.reps,
                         args.warmup) / n_chips, 1)
        out["beam4_full_sents_per_sec"] = round(
            bench_decode(args.batch, args.dtype, "beam_full", 19,
                         args.reps, args.warmup) / n_chips, 1)

    if args.export_decode:
        out["export_kv_serving"] = bench_export_decode(
            args.batch, args.dtype, 19, args.reps, args.warmup)

    if args.decode_attn_ab:
        out["decode_attn_ab"] = bench_decode_attn_ab(
            args.batch, args.dtype, args.reps, args.warmup)

    if args.attn_kernel_ab:
        out["attn_kernel_ab"] = bench_attn_kernel_ab(
            args.batch, args.scan_steps, args.steps, args.reps,
            args.warmup, args.dtype)

    if args.attn_ab:
        out["attn_layout_ab"] = bench_attn_ab(
            args.batch, args.scan_steps, args.steps, args.reps,
            args.warmup, args.dtype)

    if args.qkv_ab:
        out["qkv_pack_ab"] = bench_qkv_ab(
            args.batch, args.scan_steps, args.steps, args.reps,
            args.warmup, args.dtype)

    if args.model_scale:
        rows = {}
        for d, layers, b, k in ((256, 6, 512, 8), (512, 6, 512, 4),
                                (768, 6, 512, 2)):
            rows[f"d{d}_L{layers}_B{b}"] = bench_model_scale(
                d, layers, b, k, 2, args.reps, 1, args.dtype)
        out["model_scaling"] = rows

    if args.ce_ab:
        out["ce_kernel_vs_scan"] = bench_ce_ab(256, args.dtype, args.reps,
                                               args.warmup)

    if args.seq_ab:
        out["seq_pad_ab_flagship"] = bench_seq_ab(
            args.batch, args.scan_steps, args.steps, args.reps,
            args.warmup, args.dtype)
    if args.seq_ab_d256:
        out["seq_pad_ab_d256"] = bench_seq_ab(
            512, 8, 2, args.reps, 1, args.dtype, d_model=256)

    if args.scaling:
        rows = {}
        for b in (256, 1024):
            sps, fl, _ = bench_batch(b, max(4, args.scan_steps // (b // 64)),
                                     2, 2, 1, args.dtype)
            row = {"sents_per_sec": round(sps / n_chips, 1)}
            if fl:
                row["mfu"] = round(fl * (sps / n_chips) / b
                                   / V5E_PEAK_FLOPS, 4)
            rows[str(b)] = row
        out["batch_scaling"] = rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
