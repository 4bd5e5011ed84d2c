"""Learning-rate schedules matching the reference trainer's ``--lr_scheduler``.

The reference builds these through ``diffusers.optimization.get_scheduler``
(``concept_training/diffusers_training_xl_new.py:23,354-363,906-911``), whose
six names and shapes come from ``transformers.optimization``. Here each is an
optax-style schedule: a callable ``step -> lr`` usable directly as the
``learning_rate`` of ``optax.adamw`` / ``adamw8bit``.

Step units: the reference multiplies warmup/total by
``gradient_accumulation_steps`` because accelerate ticks its LambdaLR once
per *micro* step; our optimizers count *optimizer* steps (``optax.MultiSteps``
advances the inner count once per accumulation boundary), so callers pass
warmup/total in optimizer steps unscaled — the effective schedule over
optimizer steps is identical.
"""

from __future__ import annotations

import jax.numpy as jnp

LR_SCHEDULER_NAMES = (
    "constant",
    "constant_with_warmup",
    "linear",
    "cosine",
    "cosine_with_restarts",
    "polynomial",
)


def get_lr_schedule(
    name: str,
    base_lr: float,
    warmup_steps: int = 0,
    total_steps: int = 1,
    num_cycles: float | None = None,
    power: float = 1.0,
    lr_end: float = 1e-7,
):
    """``step -> lr`` callable for one of ``LR_SCHEDULER_NAMES``.

    Shapes match ``transformers.optimization`` lambdas exactly (warmup is
    linear from 0 and ``lr(warmup_steps) == base_lr`` for every warmed-up
    schedule; ``cosine`` defaults ``num_cycles=0.5``, ``cosine_with_restarts``
    defaults ``num_cycles=1`` hard restarts; ``polynomial`` decays to
    ``lr_end`` and stays there past ``total_steps``).
    """
    if name not in LR_SCHEDULER_NAMES:
        raise ValueError(f"unknown lr_scheduler {name!r}; choose from {LR_SCHEDULER_NAMES}")
    warmup = max(int(warmup_steps), 0)
    total = max(int(total_steps), warmup + 1)

    if name == "constant":
        return lambda step: jnp.full((), base_lr, jnp.float32)

    def warmup_factor(step):
        return jnp.minimum(1.0, step / jnp.maximum(warmup, 1))

    def progress(step):
        return jnp.clip((step - warmup) / (total - warmup), 0.0, 1.0)

    if name == "constant_with_warmup":
        factor = warmup_factor
    elif name == "linear":
        def factor(step):
            return jnp.where(step < warmup, warmup_factor(step), 1.0 - progress(step))
    elif name == "cosine":
        cycles = 0.5 if num_cycles is None else float(num_cycles)

        def factor(step):
            decay = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress(step))))
            return jnp.where(step < warmup, warmup_factor(step), decay)
    elif name == "cosine_with_restarts":
        cycles = 1.0 if num_cycles is None else float(num_cycles)

        def factor(step):
            p = progress(step)
            decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * ((cycles * p) % 1.0))))
            # the transformers lambda returns 0 exactly at the end of training
            decay = jnp.where(p >= 1.0, 0.0, decay)
            return jnp.where(step < warmup, warmup_factor(step), decay)
    else:  # polynomial
        if base_lr <= lr_end:
            raise ValueError(f"polynomial needs base_lr ({base_lr}) > lr_end ({lr_end})")

        def factor(step):
            remaining = (1.0 - progress(step)) ** power
            lr = (base_lr - lr_end) * remaining + lr_end
            return jnp.where(step < warmup, warmup_factor(step) * base_lr, lr) / base_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return (base_lr * factor(step)).astype(jnp.float32)

    return schedule
