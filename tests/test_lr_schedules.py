"""LR schedules vs hand-computed transformers.optimization lambdas.

The reference trainer builds these via diffusers' ``get_scheduler``
(``concept_training/diffusers_training_xl_new.py:906-911``); shapes and
endpoint conventions are pinned here against the published formulas.
"""

import math

import numpy as np
import pytest

from tweediemix_tpu.training.lr_schedules import LR_SCHEDULER_NAMES, get_lr_schedule

LR, WARMUP, TOTAL = 1e-3, 10, 100


def _expected(name, step):
    # transformers.optimization lambdas, multiplied by the base lr
    if name == "constant":
        return LR
    if step < WARMUP and name != "polynomial":
        return LR * step / WARMUP
    progress = (step - WARMUP) / (TOTAL - WARMUP)
    if name == "constant_with_warmup":
        return LR
    if name == "linear":
        return LR * max(0.0, 1.0 - progress)
    if name == "cosine":
        return LR * max(0.0, 0.5 * (1.0 + math.cos(math.pi * 0.5 * 2.0 * progress)))
    if name == "cosine_with_restarts":
        if progress >= 1.0:
            return 0.0
        return LR * max(0.0, 0.5 * (1.0 + math.cos(math.pi * ((1.0 * progress) % 1.0))))
    if name == "polynomial":
        lr_end = 1e-7
        if step < WARMUP:
            return LR * step / WARMUP
        return (LR - lr_end) * (1.0 - progress) ** 1.0 + lr_end
    raise AssertionError(name)


@pytest.mark.parametrize("name", LR_SCHEDULER_NAMES)
def test_matches_reference_lambdas(name):
    sched = get_lr_schedule(name, LR, WARMUP, TOTAL)
    for step in [0, 1, 5, 9, 10, 11, 37, 55, 90, 99, 100]:
        np.testing.assert_allclose(
            # atol floor: the schedule computes cos in f32 on device, so near
            # the cosine zero (end of training) the relative error blows up
            # while the absolute error stays ~1e-11 of base_lr
            float(sched(step)), _expected(name, step), rtol=1e-5, atol=LR * 1e-7,
            err_msg=f"{name} at step {step}")


@pytest.mark.parametrize("name", LR_SCHEDULER_NAMES)
def test_warmup_reaches_base_lr(name):
    sched = get_lr_schedule(name, LR, WARMUP, TOTAL)
    assert float(sched(WARMUP)) == pytest.approx(LR, rel=1e-6)


def test_polynomial_floors_at_lr_end():
    sched = get_lr_schedule("polynomial", LR, WARMUP, TOTAL, lr_end=1e-7)
    assert float(sched(TOTAL)) == pytest.approx(1e-7, rel=1e-3)
    assert float(sched(TOTAL + 50)) == pytest.approx(1e-7, rel=1e-3)


def test_unknown_name_raises():
    with pytest.raises(ValueError):
        get_lr_schedule("exotic", LR, WARMUP, TOTAL)


def test_jit_traceable_and_adam_compatible():
    """Schedules must work as optax learning_rate inside jit, including the
    int8 optimizer (the reference combines --lr_scheduler with AdamW8bit)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tweediemix_tpu.training.adam8bit import adamw8bit

    sched = get_lr_schedule("linear", LR, 2, 10)
    for opt in (optax.adamw(learning_rate=sched), adamw8bit(learning_rate=sched)):
        params = {"w": jnp.ones((8, 128))}
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            g = jax.tree_util.tree_map(jnp.ones_like, p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s

        p1, state = step(params, state)
        p2, _ = step(p1, state)
        assert np.isfinite(np.asarray(p2["w"])).all()
        assert not np.allclose(np.asarray(p2["w"]), np.asarray(params["w"]))
