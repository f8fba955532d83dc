"""Where does the compute-bound step's time go? (VERDICT r2 item 1)

Times the d_model-scaled train step under component ablations on the
real TPU: CE kernel vs scan, dropout on/off, no-CE forward bound, f32 vs
bf16. Emits one JSON line per variant -> results/mfu_ablation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

V5E_PEAK = 197e12


def scaled_cfg(d, layers, batch, dtype, dropout=0.1, rng_impl="threefry"):
    from deepsc_gan_tpu.utils.config import Config

    return Config(bs=batch, dtype=dtype, rng_impl=rng_impl,
                  encoder_d_model=d, decoder_d_model=d,
                  encoder_d_ff=4 * d, decoder_d_ff=4 * d,
                  encoder_num_layer=layers, decoder_num_layer=layers,
                  encoder_dropout=dropout, decoder_dropout=dropout)


def time_step(cfg, scan_k, steps, reps, variant="full"):
    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.ops.masks import create_masks
    from deepsc_gan_tpu.train.steps import (
        create_train_state,
        make_train_multi_step,
    )

    from deepsc_gan_tpu.train.steps import make_step_key

    model = make_model(cfg, "transformer")
    key = make_step_key(cfg, 0)
    state = create_train_state(model, cfg, key)

    if variant == "no_ce":
        # fwd+bwd of sum(hidden): everything EXCEPT the vocab
        # projection+CE — bounds the non-CE time
        import functools

        @functools.partial(jax.jit, donate_argnums=())
        def mstep(state, inps, tars, key, n_std):
            def body(state, xs):
                inp, tar, k = xs
                tar_inp = tar[:, :-1]
                enc_m, comb_m, dec_m = create_masks(inp, tar_inp,
                                                    cfg.pad_idx)
                k_ch, k_do = jax.random.split(k)
                p = jnp.zeros((inp.shape[0], cfg.seq_len, cfg.channel_dim),
                              jnp.float32)

                def loss_fn(params):
                    tx = model.apply({"params": params}, inp, enc_m,
                                     deterministic=False,
                                     rngs={"dropout": k_do},
                                     method="encode")
                    y = model.apply({"params": params}, k_ch, tx, p, 0.0,
                                    n_std, "AWGN", method="transmit")
                    hidden = model.apply({"params": params}, tar_inp, y,
                                         comb_m, dec_m,
                                         deterministic=False,
                                         rngs={"dropout": k_do},
                                         method="decode_loss_ready")
                    return jnp.sum(hidden.astype(jnp.float32))

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                return state.apply_gradients(grads), loss

            keys = jax.random.split(key, inps.shape[0])
            return jax.lax.scan(body, state, (inps, tars, keys))
    else:
        mstep = make_train_multi_step(model, cfg, donate=False)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        0, cfg.vocab_size, size=(scan_k, cfg.bs, cfg.seq_len)),
        dtype=jnp.int32)

    flops = None
    try:
        ca = mstep.lower(state, batch, batch, key,
                         jnp.asarray(0.1)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0)) or None
    except Exception:
        pass

    for _ in range(2):
        key, sub = jax.random.split(key)
        state, losses = mstep(state, batch, batch, sub, 0.1)
    float(losses.sum())  # true sync: value readback (block_until_ready
    # over the axon tunnel reports phantom times)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, losses = mstep(state, batch, batch, sub, 0.1)
        float(losses.sum())
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / (steps * scan_k)
    row = {"step_ms": round(ms, 3)}
    if flops:
        row["flops"] = round(flops)
        row["mfu"] = round(flops / (ms / 1e3) / V5E_PEAK, 4)
    return row


def main():
    from deepsc_gan_tpu.ops.pallas.ce import set_ce_kernel_mode

    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--scan-k", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--variants", default="pallas,scan,no_dropout,no_ce")
    ap.add_argument("--out", default="results/mfu_ablation.json")
    args = ap.parse_args()

    out = {"config": f"d{args.d}_L{args.layers}_B{args.batch}"}
    for v in args.variants.split(","):
        cfg = scaled_cfg(args.d, args.layers, args.batch, "bfloat16")
        if v == "scan":
            set_ce_kernel_mode("scan")
        elif v == "no_dropout":
            cfg = scaled_cfg(args.d, args.layers, args.batch, "bfloat16",
                             dropout=0.0)
        elif v == "rbg":
            cfg = scaled_cfg(args.d, args.layers, args.batch, "bfloat16",
                             rng_impl="rbg")
        elif v == "opt":
            # production-at-scale knobs: rbg RNG + per-layer remat
            cfg = scaled_cfg(args.d, args.layers, args.batch, "bfloat16",
                             rng_impl="rbg").replace(remat=True)
        elif v == "f32":
            cfg = scaled_cfg(args.d, args.layers, args.batch, "float32")
        try:
            out[v] = time_step(cfg, args.scan_k, args.steps, args.reps,
                               variant="no_ce" if v == "no_ce" else "full")
        finally:
            set_ce_kernel_mode("auto")
        print(v, out[v], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.setdefault(out["config"], {}).update(out)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
