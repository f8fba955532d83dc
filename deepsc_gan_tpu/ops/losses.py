"""Masked cross-entropy loss.

Behavioral spec from the reference `loss_function`
(`DeepSC-GAN/models/modules.py:738-755`): sparse categorical CE from
logits, masked where target == <PAD>, then `reduce_mean` over ALL (B, L)
positions — i.e. padded positions contribute zeros to the mean, they are
NOT excluded from the denominator. That exact normalization is what the
published loss/BLEU curves were trained with, so it is the default here.

Quirk Q2 (SURVEY.md §7): the reference also *intends* to mask ids 4 ('')
and 5 ('!') but a bug recomputes those masks from the pad mask
(modules.py:749-750), so effectively only <PAD> is masked. We reproduce
pad-only masking by default and expose the intended behavior behind
`extra_masked_ids`.

TPU note: the (B, L, 22234) logits tensor dominates this model's HBM
traffic. The CE here uses log_softmax + take_along_axis, which XLA fuses
into the consumer of the logits matmul; a Pallas kernel that fuses the
vocab projection with the CE reduction (never materializing logits in HBM)
lives in ops/pallas/ and is used by the fast path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy_per_token(real: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Sparse softmax CE per position. real: (B, L) int; logits: (B, L, V).
    Computed in float32 regardless of logits dtype."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, real[..., None].astype(jnp.int32), axis=-1)
    return logz - gold[..., 0]


def loss_function(
    real: jnp.ndarray,
    logits: jnp.ndarray,
    pad_idx: int = 0,
    extra_masked_ids: Optional[Sequence[int]] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Reference-parity masked CE: zero out masked positions, mean over all.

    `label_smoothing` (alpha) mixes the one-hot target with the uniform
    distribution over the vocab (an extension beyond the reference recipe;
    alpha=0 reproduces it exactly):
        loss = logZ - (1-alpha)*logit_gold - alpha*mean_v(logit_v)
    """
    ce = cross_entropy_per_token(real, logits)
    if label_smoothing:
        lg32 = logits.astype(jnp.float32)
        gold = jnp.take_along_axis(
            lg32, real[..., None].astype(jnp.int32), axis=-1)[..., 0]
        ce = ce + label_smoothing * (gold - jnp.mean(lg32, axis=-1))
    mask = (real != pad_idx).astype(jnp.float32)
    if extra_masked_ids:
        for tid in extra_masked_ids:
            mask = mask * (real != tid).astype(jnp.float32)
    return jnp.mean(ce * mask)


def masked_mean_loss(
    real: jnp.ndarray, logits: jnp.ndarray, pad_idx: int = 0
) -> jnp.ndarray:
    """The 'correct' normalization (sum over unmasked / count of unmasked) —
    offered for users who want a pad-invariant loss; NOT what the reference
    curves used."""
    ce = cross_entropy_per_token(real, logits)
    mask = (real != pad_idx).astype(jnp.float32)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
