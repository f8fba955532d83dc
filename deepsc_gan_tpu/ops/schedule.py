"""Learning-rate schedules and optimizer construction.

`noam_schedule` matches the reference `CustomSchedule`
(`DeepSC-GAN/models/modules.py:719-735`):
lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5).

The committed reference notebooks trained with plain Adam(lr=5e-4)
(`utlis/parameters.py:22`), so `make_optimizer` defaults to that and takes
`schedule="noam"` for the Noam variant.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int = 4000) -> optax.Schedule:
    def schedule(step):
        # reference evaluates at float step; optax passes int — step 0 would
        # divide by zero in rsqrt, so clamp to >= 1 like Keras' 1-based steps
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return jnp.asarray(d_model, jnp.float32) ** -0.5 * jnp.minimum(
            s**-0.5, s * warmup_steps**-1.5
        )

    return schedule


def make_optimizer(
    lr: float = 5e-4,
    schedule: str = "constant",
    d_model: int = 128,
    warmup_steps: int = 4000,
    decay_steps: int = 40000,
) -> optax.GradientTransformation:
    if schedule == "noam":
        lr_fn = noam_schedule(d_model, warmup_steps)
        # reference pairs CustomSchedule with Adam(beta1=0.9, beta2=0.98,
        # eps=1e-9) per the standard Transformer recipe
        return optax.adam(lr_fn, b1=0.9, b2=0.98, eps=1e-9)
    if schedule == "cosine":
        # extension beyond the reference recipe (constant Adam forever
        # limits convergence on long data-limited runs): linear warmup to
        # lr then cosine decay to lr/20 over decay_steps
        lr_fn = optax.warmup_cosine_decay_schedule(
            init_value=lr / 10, peak_value=lr,
            warmup_steps=min(warmup_steps, decay_steps // 10),
            decay_steps=decay_steps, end_value=lr / 20)
        return optax.adam(lr_fn)
    return optax.adam(lr)
