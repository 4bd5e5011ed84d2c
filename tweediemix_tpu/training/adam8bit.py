"""Blockwise int8-state AdamW — TPU-native equivalent of bitsandbytes
``AdamW8bit`` (used by the reference trainer when ``--use_8bit_adam`` is
set: ``concept_training/diffusers_training_xl_new.py:736-746``, enabled in
``singleconcept_train.sh:20``).

Both Adam moments are stored as int8 with per-block fp32 absmax scales
(1 byte per parameter per moment + one fp32 scale per ``BLOCK`` params —
the same memory footprint as bitsandbytes). bnb uses a nonlinear "dynamic
map" code; here the codes are linear, which is simpler, fully
jit-compatible, and empirically converges the same at these scales
(tests/test_training.py::test_adam8bit_matches_fp32_adam). The moments are
dequantized, updated in fp32, and re-quantized inside the jitted step, so
only the int8 state persists in HBM between steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def quantize_blockwise(x: jnp.ndarray):
    """-> (q int8 [nblocks, BLOCK], scale fp32 [nblocks, 1])."""
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.shape[0]) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_blockwise(q: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    n = 1
    for d in shape:
        n *= d
    flat = (q.astype(jnp.float32) * scale).reshape(-1)[:n]
    return flat.reshape(shape)


def quantize_v_blockwise(v: jnp.ndarray):
    """Second moment stored in sqrt domain: a linear code on v itself zeroes
    any entry < max_block/254, and ``m / (sqrt(0)+eps)`` then explodes (bnb
    avoids this with its nonlinear dynamic map). sqrt compresses the dynamic
    range so small-but-nonzero curvature survives 8 bits."""
    return quantize_blockwise(jnp.sqrt(v))


def dequantize_v_blockwise(q: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    s = dequantize_blockwise(q, scale, shape)
    return s * s


class _Q8(NamedTuple):
    q: Any  # int8 [nblocks, BLOCK]
    scale: Any  # fp32 [nblocks, 1]


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    m: Any  # pytree of _Q8
    v: Any  # pytree of _Q8


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """optax transform: Adam scaling with int8 blockwise-quantized moments."""

    def q_zeros(p):
        return _Q8(*quantize_blockwise(jnp.zeros(p.shape, jnp.float32)))

    def init_fn(params):
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree.map(q_zeros, params),
            v=jax.tree.map(q_zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)

        is_q8 = lambda x: isinstance(x, _Q8)

        def new_m(g, q8):
            prev = dequantize_blockwise(q8.q, q8.scale, g.shape)
            return b1 * prev + (1.0 - b1) * g.astype(jnp.float32)

        def new_v(g, q8):
            prev = dequantize_v_blockwise(q8.q, q8.scale, g.shape)
            return b2 * prev + (1.0 - b2) * jnp.square(g.astype(jnp.float32))

        m = jax.tree.map(new_m, updates, state.m, is_leaf=is_q8)
        v = jax.tree.map(new_v, updates, state.v, is_leaf=is_q8)
        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda mm, vv: ((mm / bc1) / (jnp.sqrt(vv / bc2) + eps)).astype(jnp.float32),
            m,
            v,
        )
        new_state = ScaleByAdam8bitState(
            count=count,
            m=jax.tree.map(lambda x: _Q8(*quantize_blockwise(x)), m),
            v=jax.tree.map(lambda x: _Q8(*quantize_v_blockwise(x)), v),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """Drop-in ``optax.adamw`` replacement with int8 moment state.

    ``learning_rate`` may be a float or an optax schedule (``step -> lr``),
    same contract as ``optax.adamw``."""
    return optax.chain(
        scale_by_adam8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
