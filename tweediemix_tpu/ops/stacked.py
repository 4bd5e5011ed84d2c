"""Concept-stacked linear projections — the data-flow replacement for the
reference's per-concept module surgery.

The reference wires concept-specific ``to_k_i``/``to_v_i`` Linears (or LoRA
``to_{q,k,v,out}_i_lora`` factor pairs) onto each attention module and picks
one per batch row in a hand-rolled forward
(``fusion_generation/utils_custom.py:61-82``,
``fusion_generation/utils_lora.py:65-79,115-119``).

Here concept weights are *stacked arrays* with a leading concept axis and a
per-batch-row index selects the slot: a gather followed by one batched
matmul, which XLA maps straight onto the MXU. Slot 0 is always the base
model (CD) or the zero delta (LoRA), so "no concept" is just index 0 and a
single jitted code path covers every sampling phase.
"""

from __future__ import annotations

import jax.numpy as jnp


def stacked_linear(
    x: jnp.ndarray,
    w_stack: jnp.ndarray,
    idx: jnp.ndarray,
    b_stack: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-row weight selection + matmul.

    Args:
      x: [B, S, Din].
      w_stack: [C, Din, Dout] (slot 0 = base weights).
      idx: int32 [B], each row's concept slot.
      b_stack: optional [C, Dout] biases.

    Returns [B, S, Dout] = x @ w_stack[idx] (+ b_stack[idx]).
    """
    w = w_stack[idx]  # [B, Din, Dout]
    out = jnp.einsum("bsd,bdo->bso", x, w, preferred_element_type=jnp.float32)
    if b_stack is not None:
        out = out + b_stack[idx][:, None, :].astype(out.dtype)
    return out.astype(x.dtype)


def lora_delta(
    x: jnp.ndarray,
    down_stack: jnp.ndarray,
    up_stack: jnp.ndarray,
    idx: jnp.ndarray,
) -> jnp.ndarray:
    """Per-row LoRA delta ``(x @ down[idx]) @ up[idx]``.

    Matches the reference ``LoRALinearLayer`` semantics
    (``fusion_generation/model_lora.py:28-48``): rank-r factors, no scaling
    term beyond the factors themselves. ``down_stack``: [C, Din, r],
    ``up_stack``: [C, r, Dout]; slot 0 should hold zeros so index 0 means
    "no delta".

    The contraction runs in fp32: rank-4 factors are tiny, and bf16 rounding
    on an r=4 inner product is a real fidelity loss.
    """
    down = down_stack[idx].astype(jnp.float32)
    up = up_stack[idx].astype(jnp.float32)
    h = jnp.einsum("bsd,bdr->bsr", x.astype(jnp.float32), down)
    out = jnp.einsum("bsr,bro->bso", h, up)
    return out.astype(x.dtype)
