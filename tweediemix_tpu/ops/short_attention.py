"""Fused short-sequence (frame-axis) self-attention as a Pallas TPU kernel.

The I2VGen-XL UNet runs temporal attention over S=16 frames batched over
every pixel (``models/unet3d.py::TemporalBasicBlock``, mirroring the
reference's ``TransformerTemporalModel`` — the video UNet diffusers builds
for ``video_gen/pipeline_i2vgen_xl.py``). As plain XLA ops that is the
worst shape on a TPU: per-(pixel, head) matmuls of [16, dh] @ [dh, 16]
with fp32 [N*H, 16, 16] score tensors round-tripping HBM in separate
qk / sub / exp-sum / div / pv passes, plus head split/merge transposes.

This kernel packs G = 128//S independent frame-bands into one 128-row MXU
matmul with a block-diagonal mask, so scores never leave VMEM and the
whole attention is one pass over q/k/v:

  [N, S, H*dh] --reshape+head-transpose--> [H, N*S, dh]
  grid (heads, row blocks); per step a [128, dh] q-band-group multiplies
  the matching k-group into a [128, 128] fp32 score tile (8 pixels' 16x16
  score blocks on the diagonal, cross-pixel entries masked), exp2, p @ v
  back to [128, dh].

VPU economy (the first cut of this kernel lost to XLA by spending ~500
VPU cycles per group on max/exp/sum/div over the 8x-masked tile):
* softmax scale and the exp->exp2 base change are folded into q on the
  host side; no per-tile scale multiply;
* one rowwise max (needed for correctness: all-strongly-negative rows
  would underflow exp2 to a zero vector otherwise) plus a +100 log2
  clamp as an overflow belt; no separate sub pass — the shift fuses into
  the exp2 input;
* the denominator rides the p@v matmul in a ones-column of v (same trick
  as ops/flash_attention.py) when dh % 128 != 0, and normalization is a
  reciprocal multiply.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_CLAMP = 100.0  # log2-domain score clamp replacing the rowwise max pass

# sequence lengths the packing supports: a band must divide 128 rows
_ALLOWED_S = (1, 2, 4, 8, 16, 32, 64, 128)


def _short_kernel(
    q_ref, k_ref, v_ref, o_ref, *, s_pad, s_orig, groups, dh, use_ones_col
):
    """One (head, row-block) grid step: q/k refs [1, block_rows, dh],
    v ref [1, block_rows, dh(+1)], o ref [1, block_rows, dh]."""
    # block-diagonal mask: row r is frame r % s_pad of pixel r // s_pad and
    # may attend only its own pixel's real frames
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ok = (ri // s_pad == ci // s_pad) & ((ci % s_pad) < s_orig)
    mask = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)

    for g in range(groups):
        lo = g * 128
        qg = q_ref[0, lo : lo + 128, :]
        kg = k_ref[0, lo : lo + 128, :]
        vg = v_ref[0, lo : lo + 128, :]
        s = jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        sm = s + mask
        # rowwise max keeps softmax shift-invariant: without it, rows whose
        # real scores are all <= -126 in the log2 domain underflow exp2 to
        # zero and the floored denominator returns a zero vector instead of
        # a weighted average (every row has >= 1 in-band entry, so the max
        # is finite). The +100 clamp stays as an overflow belt.
        m = jnp.max(sm, axis=1, keepdims=True)
        p = jnp.exp2(jnp.minimum(sm - m, _CLAMP)).astype(vg.dtype)
        ov = jax.lax.dot_general(
            p, vg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if use_ones_col:
            denom = ov[:, dh : dh + 1]
            o = ov[:, :dh]
        else:
            denom = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = ov
        o_ref[0, lo : lo + 128, :] = (
            o * (1.0 / jnp.maximum(denom, 1e-30))
        ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_rows", "interpret")
)
def short_seq_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
    block_rows: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention over very short sequences (frame axis).

    Args:
      q, k, v: [N, S, D] with D = num_heads * dh and S <= 128 (the frame
        count; every N row attends only within its own S-band).
      scale: softmax scale; defaults to dh**-0.5.
      block_rows: q/k/v rows per grid step (multiple of 128).
      interpret: run in interpreter mode (CPU testing).

    Returns [N, S, D] in q's dtype.
    """
    n, s, d = q.shape
    dh = d // num_heads
    if scale is None:
        scale = float(dh) ** -0.5

    # fold softmax scale and the exp->exp2 base change into q (see kernel)
    q = (q.astype(jnp.float32) * (scale * math.log2(math.e))).astype(q.dtype)

    # pad the frame axis to a divisor of 128 so bands pack exactly
    s_pad = next(a for a in _ALLOWED_S if a >= s)
    if s_pad != s:
        padf = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, padf), jnp.pad(k, padf), jnp.pad(v, padf)

    # head-major token form [H, N*S, dh]: TPU BlockSpecs need the last two
    # block dims tile-aligned, so the head axis must lead (dh = 64 can't be
    # a lane block of a [T, H*dh] array). XLA fuses this transpose into the
    # producing projection's output layout where it can. Padded rows are
    # all-zero: their scores are 0 + mask, exp2 stays finite, and v rows
    # of 0 give o = 0 (their denominator-column entry is 0 too, hence the
    # 1e-30 floor).
    rows = n * s_pad
    block_rows = min(block_rows, _round_up(rows, 128))
    rows_pad = _round_up(rows, block_rows)

    def to_hmajor(x):
        x = x.reshape(rows, num_heads, dh).transpose(1, 0, 2)
        if rows_pad != rows:
            x = jnp.pad(x, ((0, 0), (0, rows_pad - rows), (0, 0)))
        return x

    qh, kh, vh = to_hmajor(q), to_hmajor(k), to_hmajor(v)

    # denominator-in-matmul: a ones-column at index dh makes the p@v pass
    # emit the softmax row-sum in output lanes that dh=64 leaves idle; at
    # dh % 128 == 0 the column would cost an extra output tile, so those
    # head dims keep a VPU row-sum instead (same gating as flash_attention)
    use_ones_col = dh % 128 != 0
    dh_v = dh + 1 if use_ones_col else dh
    if use_ones_col:
        ones = jnp.ones((num_heads, rows_pad, 1), vh.dtype)
        if rows_pad != rows:
            ones = ones.at[:, rows:].set(0.0)
        vh = jnp.concatenate([vh, ones], axis=-1)

    grid = (num_heads, rows_pad // block_rows)
    kernel = functools.partial(
        _short_kernel, s_pad=s_pad, s_orig=s, groups=block_rows // 128,
        dh=dh, use_ones_col=use_ones_col,
    )
    spec = pl.BlockSpec((1, block_rows, dh), lambda h, i: (h, i, 0))
    vspec = pl.BlockSpec((1, block_rows, dh_v), lambda h, i: (h, i, 0))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((num_heads, rows_pad, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_pad * 128 * d,
            bytes_accessed=4 * rows_pad * d * q.dtype.itemsize,
            transcendentals=rows_pad * 128 * num_heads,
        ),
    )(qh, kh, vh)

    out = out[:, : n * s_pad].transpose(1, 0, 2).reshape(n, s_pad, d)
    return out[:, :s] if s_pad != s else out
