"""Attention dispatch: Pallas flash kernel on TPU, fused XLA path elsewhere.

Replaces both attention backends of the reference — xformers
``memory_efficient_attention`` and the hand-rolled einsum+softmax in the
patched forwards (``fusion_generation/utils_custom.py:93-103``) — with one
primitive. Head split/merge happens here so model code only sees
``[B, S, D]`` tensors.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from tweediemix_tpu.ops.flash_attention import flash_attention

# Flash-kernel dispatch, measured on v5e (30-call scans, bf16, dh=64):
#   BH=40 S=4096: flash(1024,1024) 3.7 ms / 46 TFLOP/s vs XLA fused 8.8 ms
#   BH=80 S=1024: flash(512,1024) 1.33 ms vs XLA 1.9 ms
#   certain grids degenerate catastrophically on this toolchain (e.g.
#   blocks (256,512)@4096, (512,512)@1024, (1024,1024)@1024 run ~1000x
#   slow) — the block table below only contains measured-good configs.
# Flash engages for self-attention with both sides >= 1024 tokens (SDXL
# levels 1 and 2 + mid); cross-attention (kv=77) stays on XLA. At S=256
# flash wins standalone microbenches at small BH (docs/PERF.md) but the
# win doesn't survive in-loop where XLA fuses the multipass with its
# neighbors — the video loop measures 514.0 ms/step with
# TWEEDIEMIX_FLASH_MIN_S=256 vs 512.9 at the 1024 default.
# Override with TWEEDIEMIX_ATTENTION=flash|xla and
# TWEEDIEMIX_FLASH_MIN_S=<tokens> (threshold experiments).
_FLASH_MIN_SQ = 1024
_FLASH_MIN_SK = 1024


def _flash_min_s() -> int:
    return int(os.environ.get("TWEEDIEMIX_FLASH_MIN_S", _FLASH_MIN_SQ))


def _use_flash(sq: int, dh: int) -> bool:
    force = os.environ.get("TWEEDIEMIX_ATTENTION", "auto")
    if force == "flash":
        return True
    if force == "xla":
        return False
    # "auto" falls through to the measured thresholds
    return (
        jax.default_backend() == "tpu"
        and sq >= _flash_min_s()
        and dh in (64, 128, 256)
    )


def _bf16_scores_max_sk() -> int:
    """bf16 score materialization for small key lengths.

    The XLA fallback's [BH, Sq, Sk] fp32 score tensor round-trips HBM for
    every softmax pass; at the video UNet's temporal sites (Sk=16, BH≈65k)
    those tensors are tens of MB per call and the softmax is
    bandwidth-bound. Casting the scores to bf16 in the matmul epilogue
    halves that traffic. Gated to Sk <= this threshold because the softmax
    denominator is then a bf16 sum over Sk positive values — fine at
    Sk<=128, unsafe at Sk=4096.

    Measured on the v5e chip (docs/PERF.md round 4): video step
    512.8 → 504.5 ms (−1.6%) at threshold 128; the image fused step is
    neutral (245.3 vs 244.6 ms — its only XLA-path site is cross-attn
    Sk=77). Default: 32 on TPU (temporal sites only, image path untouched),
    0 elsewhere. Override with TWEEDIEMIX_BF16_SCORES_MAX_SK=<n>."""
    default = "32" if jax.default_backend() == "tpu" else "0"
    return int(os.environ.get("TWEEDIEMIX_BF16_SCORES_MAX_SK", default))


def _xla_attention(q, k, v, scale):
    # dtype gate: only bf16 inputs (the UNet sites that were measured and
    # parity-tested). fp32 callers — SAM's mask-decoder token attention
    # (Sk≈8) — keep full-precision softmax; their outputs feed a >0 mask
    # threshold where bf16 rounding could flip boundary pixels.
    if q.dtype == jnp.bfloat16 and 0 < k.shape[1] <= _bf16_scores_max_sk():
        # fp32 MXU accumulation, bf16 materialization (cast fuses into the
        # matmul epilogue); softmax runs in bf16 — exact max, rounded exp,
        # and a short positive sum
        s = jnp.einsum("bid,bjd->bij", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s.astype(jnp.bfloat16), axis=-1)
        return jnp.einsum("bij,bjd->bid", p.astype(v.dtype), v).astype(q.dtype)
    s = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bij,bjd->bid", p.astype(v.dtype), v).astype(q.dtype)


# cap on the materialized [BH, Sq, Sk] fp32 score tensor before the XLA
# fallback switches to query-chunked evaluation (the flash kernel only
# covers dh 64/128/256; e.g. the tiny test UNet's dh=16 at 1024² latents
# is 16k tokens — unchunked that is a 16 GiB score tensor and OOMs HBM)
_XLA_SCORE_BYTES_CAP = 256 * 1024 * 1024


def _xla_attention_chunked(q, k, v, scale, chunk: int):
    """Query-chunked XLA attention: peak memory ~ BH * chunk * Sk * 4."""
    bh, sq, dh = q.shape
    pad = (-sq) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    n = q.shape[1] // chunk
    qs = q.reshape(bh, n, chunk, dh).transpose(1, 0, 2, 3)
    out = jax.lax.map(lambda qc: _xla_attention(qc, k, v, scale), qs)
    out = out.transpose(1, 0, 2, 3).reshape(bh, n * chunk, dh)
    return out[:, :sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, block_q, block_k, head_block, int8_qkpv=False):
    """Pallas flash forward with an XLA-attention backward, so training can
    differentiate through the kernel (the Pallas call has no JVP rule).
    The int8 forward keeps the fp backward (straight-through estimate —
    the knob is serving-only anyway)."""
    return flash_attention(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k,
        head_block=head_block, int8_qkpv=int8_qkpv,
    )


def _flash_fwd(q, k, v, scale, block_q, block_k, head_block, int8_qkpv=False):
    return (
        _flash(q, k, v, scale, block_q, block_k, head_block, int8_qkpv),
        (q, k, v),
    )


def _flash_bwd(scale, block_q, block_k, head_block, int8_qkpv, res, g):
    """Memory-bounded backward: the XLA attention vjp materializes the full
    [BH, S, S] fp32 score/prob matrices; at SDXL-training shapes (S=4096)
    that is GiBs. Chunk sequentially over the BH axis so the peak is one
    head's matrices."""
    q, k, v = res

    def per_bh(args):
        q1, k1, v1, g1 = args
        _, vjp = jax.vjp(
            lambda a, b, c: _xla_attention(a[None], b[None], c[None], scale)[0],
            q1, k1, v1,
        )
        return vjp(g1)

    return jax.lax.map(per_bh, (q, k, v, g))


_flash.defvjp(_flash_fwd, _flash_bwd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [BH, S, dh] tensors (fp32 softmax)."""
    dh = q.shape[-1]
    if scale is None:
        scale = float(dh) ** -0.5
    if _use_flash(q.shape[1], dh) and k.shape[1] >= min(_FLASH_MIN_SK, _flash_min_s()):
        # measured v5e sweep (tools/bench_attention.py, ones-column kernel,
        # head-blocked grids):
        #   S=4096: G=2 (1024,1024) 3.14 ms / 54.7 TFLOP/s
        #   S=1024: G=4 (256,1024)  1.31 ms / 16.4 TFLOP/s
        if k.shape[1] >= 2048:
            block_q, block_k, g = 1024, 1024, 2
        else:
            block_q, block_k, g = 256, 1024, 4
        if q.shape[0] % g:
            g = 2 if q.shape[0] % 2 == 0 else 1
        # opt-in W8A8 attention core: dynamic per-tensor int8 q/k/v with
        # both matmuls on the MXU int8 path (flash_attention int8_qkpv).
        # Serving-only; see docs/PERF.md round 5 for the measurement.
        # Interpret mode honors the knob on any backend (CPU debugging of
        # the int8 numerics); the compiled path is TPU-gated.
        use_int8 = os.environ.get("TWEEDIEMIX_FLASH_INT8", "0") == "1"
        if interpret:
            return flash_attention(
                q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                head_block=g, interpret=True, int8_qkpv=use_int8,
            )
        return _flash(q, k, v, scale, block_q, block_k, g,
                      use_int8 and jax.default_backend() == "tpu")
    score_bytes = 4 * q.shape[0] * q.shape[1] * k.shape[1]
    if score_bytes > _XLA_SCORE_BYTES_CAP:
        # no floor: for extreme BH*Sk a single query row is the smallest
        # materialization unit, keeping the cap a hard bound (chunks below
        # 8 sublanes waste VPU lanes, but correctness beats speed in this
        # last-resort fallback)
        chunk = max(1, _XLA_SCORE_BYTES_CAP // (4 * q.shape[0] * k.shape[1]))
        chunk = min(chunk, q.shape[1])
        return _xla_attention_chunked(q, k, v, scale, chunk)
    return _xla_attention(q, k, v, scale)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, H*dh] → [B*H, S, dh]."""
    b, s, d = x.shape
    dh = d // num_heads
    x = x.reshape(b, s, num_heads, dh)
    return x.transpose(0, 2, 1, 3).reshape(b * num_heads, s, dh)


def merge_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B*H, S, dh] → [B, S, H*dh]."""
    bh, s, dh = x.shape
    b = bh // num_heads
    x = x.reshape(b, num_heads, s, dh).transpose(0, 2, 1, 3)
    return x.reshape(b, s, num_heads * dh)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
) -> jnp.ndarray:
    """Multi-head attention over [B, S, D] projections (pre-head-split)."""
    if scale is None:
        scale = float(q.shape[-1] // num_heads) ** -0.5
    # opt-in Pallas path for frame-axis (S<=32) self-attention. Measured
    # NEGATIVE on v5e for the I2VGen-XL temporal blocks (docs/PERF.md
    # round 3): the fused kernel itself runs ~6 ms at the transformer_in
    # shape but the mandatory head-major relayout erases the win vs XLA's
    # fused multipass. Kept behind an env var for larger chips / future
    # toolchains.
    if (
        os.environ.get("TWEEDIEMIX_SHORT_ATTENTION", "0") == "1"
        and jax.default_backend() == "tpu"
        and q.shape == k.shape
        and q.shape[1] <= 32
        and (q.shape[-1] // num_heads) in (32, 64, 128)
    ):
        from tweediemix_tpu.ops.short_attention import short_seq_attention

        return short_seq_attention(q, k, v, num_heads, scale=scale)
    out = attention(
        split_heads(q, num_heads),
        split_heads(k, num_heads),
        split_heads(v, num_heads),
        scale=scale,
    )
    return merge_heads(out, num_heads)
