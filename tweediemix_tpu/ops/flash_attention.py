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


def _flash_kernel_int8(
    kv_len_ref,  # SMEM (1,1) int32: true kv length (<= padded Sk)
    scales_ref,  # SMEM (1,2) fp32: [score_scale, out_scale]
    q_ref,  # VMEM [G, block_q, dh] int8 (pre-scaled + quantized on host)
    k_ref,  # VMEM [G, block_k, dh] int8
    v_ref,  # VMEM [G, block_k, dh_acc] int8 — 127-column at dh when
    #       use_ones_col (dequantizes against out_scale consistently)
    o_ref,  # VMEM [G, block_q, dh] bf16/fp32 (q's original dtype)
    m_scr,  # VMEM [G, block_q, 128] fp32 (col 0 max, col 1 denom)
    acc_scr,  # VMEM [G, block_q, dh_acc] fp32
    *,
    block_k: int,
    dh: int,
    needs_mask: bool,
    use_ones_col: bool,
):
    """W8A8 variant of ``_flash_kernel``: q@kᵀ and p@v run on the MXU's
    int8 path (2× the bf16 rate; dh=64 halves both equally). Scores
    dequantize to fp32 before the online softmax (one extra VPU pass per
    tile); softmax probabilities requantize to int8 against a FIXED 1/127
    scale — exact for p ∈ (0, 1], and the denominator (the ones-column of
    v, stored as 127) is quantized identically, so the truncation of
    sub-1/254 attention weights cancels between numerator and denominator
    to first order. Scale bookkeeping:

      p8 ≈ 127·p,  v8 ≈ v/sv,  ones-col = 127
      num_i32 = Σ p8·v8 ≈ (127/sv)·Σ p·v
      den_i32 = Σ p8·127 ≈ 127²·Σ p
      out = num/den · out_scale  with  out_scale = 127·sv.
    """
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        m_scr[:, :, 1:2] = jnp.zeros_like(m_scr[:, :, 1:2])
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s32 = jax.lax.dot_general(
        q_ref[:],
        k_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [G, block_q, block_k] int32
    # dequantize into the log2 domain the fp kernel uses (score_scale
    # carries softmax-scale·log2(e)·sq·sk); fp32 is exact for int32
    # products up to 2^24, far above the 127·127·dh ≈ 2^20 worst case
    s = s32.astype(jnp.float32) * scales_ref[0, 0]

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

    p8 = jnp.round(p * 127.0).astype(jnp.int8)

    if not use_ones_col:
        # denominator from the fp probabilities (numerator uses p8; the
        # ≤1/254 mismatch is within the int8 path's error budget). Only
        # reached at dh % 128 == 0 head dims.
        m_scr[:, :, 1:2] = m_scr[:, :, 1:2] * corr + jnp.sum(p, axis=2, keepdims=True)

    pv = jax.lax.dot_general(
        p8,
        v_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    acc_scr[:] = acc_scr[:] * corr + pv.astype(jnp.float32)

    @pl.when(kv_idx == num_kv - 1)
    def _finish():
        out_scale = scales_ref[0, 1]
        if use_ones_col:
            denom = jnp.maximum(acc_scr[:, :, dh : dh + 1], 1.0)
            o_ref[:] = (
                acc_scr[:, :, :dh] / denom * out_scale
            ).astype(o_ref.dtype)
        else:
            denom = jnp.maximum(m_scr[:, :, 1:2], 1e-30)
            # numerator ≈ (127/sv)·Σpv, denom = Σp → scale by sv/127
            o_ref[:] = (
                acc_scr[:, :, :dh] / denom * (out_scale / (127.0 * 127.0))
            ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "head_block", "interpret",
                     "int8_qkpv"),
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
    int8_qkpv: bool = False,
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
      int8_qkpv: quantize q/k/v to int8 with dynamic per-tensor scales and
        run both matmuls on the MXU int8 path (``_flash_kernel_int8``);
        the abs-max reductions are linear-cost against the kernel's S²
        work. Serving-only knob (``TWEEDIEMIX_FLASH_INT8=1``).

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
    out_dtype = q.dtype

    if int8_qkpv:
        # dynamic per-tensor symmetric quantization (abs-max over the whole
        # tensor — one linear pass vs the kernel's S² work). q already
        # carries the softmax scale in the log2 domain, so score_scale =
        # sq·sk recovers log2-domain scores in the kernel.
        def _q8(x):
            s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
            x8 = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0
            ).astype(jnp.int8)
            return x8, s

        q, q_s = _q8(q)
        k, k_s = _q8(k)
        v, v_s = _q8(v)
        scales = jnp.stack([q_s * k_s, 127.0 * v_s]).reshape(1, 2).astype(jnp.float32)

    if use_ones_col:
        dh_acc = _round_up(dh + 1, 128)
        ones_col = jnp.zeros((bh, sk_p, dh_acc - dh), v.dtype)
        # int8 path: the denominator column holds 127 so it dequantizes
        # through the same 1/127 probability scale as the numerator
        ones_col = ones_col.at[:, :sk, 0].set(127 if int8_qkpv else 1.0)
        v = jnp.concatenate([v, ones_col], axis=-1)
    else:
        dh_acc = dh

    kv_len = jnp.array([[sk]], dtype=jnp.int32)

    grid = (bh // g, sq_p // block_q, sk_p // block_k)
    kern_fn = _flash_kernel_int8 if int8_qkpv else _flash_kernel
    kernel = functools.partial(
        kern_fn, block_k=block_k, dh=dh, needs_mask=needs_mask,
        use_ones_col=use_ones_col,
    )
    scalar_args = (kv_len, scales) if int8_qkpv else (kv_len,)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalar_args),
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
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * dh,
            # original (pre-quantization) itemsize: the int8 path replaces
            # q with its int8 form, but the estimate should stay the fp
            # kernel's so Mosaic sees a consistent arithmetic intensity
            bytes_accessed=(bh * (sq_p + 2 * sk_p + sq_p) * dh)
            * jnp.dtype(out_dtype).itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
    )(*scalar_args, q, k, v)

    if sq_p != sq:
        out = out[:, :sq]
    return out
