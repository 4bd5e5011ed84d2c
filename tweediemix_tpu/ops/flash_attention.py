"""Blockwise flash attention as a Pallas TPU kernel.

This is the TPU-native replacement for the reference's xformers
``memory_efficient_attention`` (enabled at
``fusion_generation/fusion_sampling.py:120,133,210`` and inside every
attention processor). Online-softmax accumulation over KV blocks keeps the
S×S score matrix out of HBM; scores and accumulators are fp32 while q/k/v
stay bf16 on the MXU.

Diffusion attention here is non-causal (image tokens attend everywhere;
cross-attention attends to all 77 text tokens), so there is no causal mask —
only an optional kv-length mask for shapes padded up to the block size.

Two measured-on-v5e tricks:
* the softmax denominator rides the p@v matmul in a ones-column of v —
  at dh=64 those MXU output lanes are idle anyway, and the VPU row-sum
  pass over the score tile disappears (gated on dh % 128 != 0: at
  dh=128/256 the column would cost an extra output tile per p@v, so
  those head dims keep a VPU row-sum in m-scratch instead);
* ``head_block`` heads are processed per grid step (batched dot_general),
  amortizing per-step scratch init/DMA overhead — worth 6-12% at SDXL
  shapes (tools/bench_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    kv_len_ref,  # SMEM (1,1) int32: true kv length (<= padded Sk)
    q_ref,  # VMEM [G, block_q, dh]
    k_ref,  # VMEM [G, block_k, dh]
    v_ref,  # VMEM [G, block_k, dh_acc] — ones-column at dh when use_ones_col
    o_ref,  # VMEM [G, block_q, dh]
    m_scr,  # VMEM [G, block_q, 128] fp32: col 0 = running max, col 1 =
    #       running denominator (l-scratch path only)
    acc_scr,  # VMEM [G, block_q, dh_acc] fp32 accumulator (column dh =
    #         denom when use_ones_col)
    *,
    block_k: int,
    dh: int,
    needs_mask: bool,
    use_ones_col: bool,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        m_scr[:, :, 1:2] = jnp.zeros_like(m_scr[:, :, 1:2])
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # scale folded into q in log2 domain (q pre-scaled by scale*log2(e) on
    # the host side): saves a full VPU pass over the score tile, and exp2 is
    # the native transcendental. The running max/denominator then live in
    # the log2 domain, which cancels in the final normalization.
    s = jax.lax.dot_general(
        q_ref[:],
        k_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, block_q, block_k]

    if needs_mask:
        kv_len = kv_len_ref[0, 0]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + kv_idx * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :, :1]
    m_cur = jnp.max(s, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)
    m_scr[:, :, :1] = m_new

    if not use_ones_col:
        # dh is a multiple of 128: a ones-column would add a whole extra
        # output tile to every p@v pass, so the denominator is a VPU
        # row-sum kept in m-scratch column 1 instead
        m_scr[:, :, 1:2] = m_scr[:, :, 1:2] * corr + jnp.sum(p, axis=2, keepdims=True)

    # with use_ones_col, v carries a ones-column at index dh, so this single
    # MXU pass yields both p@v and the row-sum of p (the softmax
    # denominator) in column dh — at dh=64 those output lanes are free on
    # the 128-lane MXU, and the separate VPU sum pass disappears.
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * corr + pv

    @pl.when(kv_idx == num_kv - 1)
    def _finish():
        if use_ones_col:
            denom = acc_scr[:, :, dh : dh + 1]
        else:
            denom = m_scr[:, :, 1:2]
        denom = jnp.maximum(denom, 1e-30)
        o_ref[:] = (acc_scr[:, :, :dh] / denom).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "head_block", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    head_block: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal flash attention.

    Args:
      q: [BH, Sq, dh] (batch*heads folded into the leading dim).
      k, v: [BH, Sk, dh].
      scale: softmax scale; defaults to dh**-0.5.
      block_q, block_k: tile sizes (clamped to padded sequence lengths).
      head_block: heads processed per grid step (must divide BH; the
        caller's dispatch falls back to 1 when it doesn't).
      interpret: run the kernel in interpreter mode (CPU testing).

    Returns [BH, Sq, dh] with q's dtype.
    """
    bh, sq, dh = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = float(dh) ** -0.5
    # fold softmax scale and the exp→exp2 base change into q (see kernel)
    import math

    q = (q.astype(jnp.float32) * (scale * math.log2(math.e))).astype(q.dtype)

    g = head_block if bh % head_block == 0 else 1
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))

    # VMEM guard: shrink blocks until the kernel's working set fits the
    # ~16 MB scoped VMEM (the score tile is fp32 block_q×block_k per head;
    # large dh inflates the q/k/v/acc tiles — 1024×1024 blocks at dh=256
    # overflow). Halve block_q first (keeps kv-streaming granularity),
    # then block_k.
    def _vmem_est(bq, bk, grp):
        dh_a = _round_up(dh + 1, 128)
        per_head = (
            2 * (bq * dh + bk * dh + bk * dh_a + bq * dh)  # q,k,v,o bf16
            + 4 * (bq * bk + bq * 128 + bq * dh_a)  # p, m, acc fp32
        )
        return 2 * grp * per_head  # ×2 for input double-buffering

    while _vmem_est(block_q, block_k, g) > 12 * 2**20 and block_q > 128:
        block_q //= 2
    while _vmem_est(block_q, block_k, g) > 12 * 2**20 and block_k > 128:
        block_k //= 2
    # blocks bottom out at 128; shed head_block next (e.g. a requested
    # G=32 at S=256/dh=64 is an 18 MB working set that used to crash the
    # Mosaic scoped-vmem allocator)
    while _vmem_est(block_q, block_k, g) > 12 * 2**20 and g > 1 and g % 2 == 0:
        g //= 2
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    needs_mask = sk_p != sk
    if needs_mask:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))

    # ones-column trick only when the extra column is lane-free: at dh=64
    # the accumulator rounds up to 128 lanes anyway, so planting a
    # ones-column at index dh makes the p@v matmul emit the softmax
    # denominator for free. When dh is already a multiple of 128 (128/256
    # heads) the column would cost a whole extra output tile per p@v, so
    # the kernel keeps the denominator in m-scratch via a VPU row-sum
    # instead. Padding kv rows keep a zero ones-column — their p is
    # already 0 via the NEG_INF mask.
    use_ones_col = _round_up(dh + 1, 128) == _round_up(dh, 128)
    if use_ones_col:
        dh_acc = _round_up(dh + 1, 128)
        ones_col = jnp.zeros((bh, sk_p, dh_acc - dh), v.dtype)
        ones_col = ones_col.at[:, :sk, 0].set(1.0)
        v = jnp.concatenate([v, ones_col], axis=-1)
    else:
        dh_acc = dh

    kv_len = jnp.array([[sk]], dtype=jnp.int32)

    grid = (bh // g, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, dh=dh, needs_mask=needs_mask,
        use_ones_col=use_ones_col,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((g, block_q, dh), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((g, block_k, dh), lambda b, i, j, *_: (b, j, 0)),
                pl.BlockSpec((g, block_k, dh_acc), lambda b, i, j, *_: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((g, block_q, dh), lambda b, i, j, *_: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((g, block_q, 128), jnp.float32),
                pltpu.VMEM((g, block_q, dh_acc), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * dh,
            bytes_accessed=(bh * (sq_p + 2 * sk_p + sq_p) * dh) * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
    )(kv_len, q, k, v)

    if sq_p != sq:
        out = out[:, :sq]
    return out
