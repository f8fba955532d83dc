"""Physical-layer adversarial attacks (FGM / PGD).

The core motif (reference `train_attack_step`, utlis/trainer.py:30-64, and
every `eval_step_*`, utlis/eval.py): take the gradient of the loss w.r.t.
an INTERMEDIATE activation (the transmitted symbols tx or the received
symbols y), normalize it into a perturbation, and re-run the forward with
that perturbation injected at the channel. With the transceiver's staged
forward this is a plain `jax.grad` w.r.t. a function input.

Normalization exactly mirrors the reference loop
(`for grad in gradients: r = eps*grad/norm(grad)` then `r/norm(r)`,
trainer.py:45-53): iterating a (B, L, C) tensor yields PER-SAMPLE (L, C)
slices, so the perturbation is normalized per-sample first, then globally.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def fgm_normalize(grad: jnp.ndarray, epsilon: float = 1.0) -> jnp.ndarray:
    """Per-sample L2 normalize * epsilon, then global L2 normalize.

    Quirk (Q7, faithful): the trailing GLOBAL normalization exactly
    cancels epsilon — per-sample rows eps*g_i/||g_i|| have global norm
    eps*sqrt(B), so the result is independent of eps. This is the
    reference's own behavior (trainer.py:45-53 and every eval_step_*:
    `r = eps*grad/norm(grad)` per row, then `r_list/norm(r_list)`);
    effective attack strength is controlled solely by PNR_dB. Kept
    exactly so attacked curves are protocol-comparable."""
    b = grad.shape[0]
    flat = grad.reshape(b, -1).astype(jnp.float32)
    per_norm = jnp.linalg.norm(flat, axis=1, keepdims=True)
    r = epsilon * flat / jnp.maximum(per_norm, 1e-12)
    r = r / jnp.maximum(jnp.linalg.norm(r), 1e-12)
    return r.reshape(grad.shape)


def fgm_perturbation(
    loss_of_intermediate: Callable[[jnp.ndarray], jnp.ndarray],
    intermediate: jnp.ndarray,
    epsilon: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """grad of `loss_of_intermediate` at `intermediate`, FGM-normalized.
    Returns (perturbation, loss_value)."""
    loss, grad = jax.value_and_grad(loss_of_intermediate)(intermediate)
    return fgm_normalize(grad, epsilon), loss


def pgd_bisection(
    loss_of_perturbation: Callable[[jnp.ndarray], jnp.ndarray],
    direction: jnp.ndarray,
    clean_loss: jnp.ndarray,
    iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's 'PGD' (utlis/eval.py:262-311): a 10-iteration
    bisection on the attack strength eps in [0, 1] along a fixed FGM
    direction, searching for the smallest eps whose attacked loss exceeds
    the clean loss. Implemented as a `lax.fori_loop` (static trip count, no
    data-dependent Python control flow). Returns (final eps, final attacked
    loss)."""

    def body(_, carry):
        lo, hi, eps, loss_m = carry
        cur = loss_of_perturbation(eps * direction)
        # loss below clean => attack too weak => raise eps; else lower it
        weak = cur - clean_loss < 0
        lo = jnp.where(weak, eps, lo)
        hi = jnp.where(weak, hi, eps)
        return lo, hi, (lo + hi) / 2.0, cur

    lo = jnp.asarray(0.0, jnp.float32)
    hi = jnp.asarray(1.0, jnp.float32)
    eps0 = (lo + hi) / 2.0
    lo, hi, eps, _ = jax.lax.fori_loop(
        0, iters, body, (lo, hi, eps0, clean_loss))
    # re-evaluate at the RETURNED eps: the loop's last loss belongs to the
    # previous midpoint, so returning it would pair a never-evaluated eps
    # with a stale loss
    return eps, loss_of_perturbation(eps * direction)
