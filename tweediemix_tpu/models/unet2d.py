"""Flax SDXL UNet2DConditionModel with concept-aware attention.

A from-scratch NHWC implementation of the SDXL denoising UNet (the
architecture the reference loads from HF at
``fusion_generation/fusion_sampling.py:119,204``), with two TPU-first
departures from the reference's runtime module surgery:

* **Custom-Diffusion concepts** (``utils_custom.py:61-82``): cross-attention
  K/V kernels are *stacked* arrays ``[slots, ctx_dim, inner]`` (slot 0 = the
  base model); a per-batch-row ``concept_idx`` selects a slot via gather +
  batched einsum, so the N-concept fused forward is one batched UNet call.
* **LoRA concepts** (``utils_lora.py:65-79,115-119``): stacked rank-r
  down/up factor pairs on q/k/v/out of both attn1 and attn2 (slot 0 = zero
  delta).

Both are config-gated (``concept_slots`` / ``lora_slots``); with both at 0
the module is a plain SDXL UNet whose param tree maps 1:1 onto the
diffusers checkpoint layout (see ``models/convert.py``).

Layout: NHWC activations (TPU-native conv layout); channel counts follow the
diffusers config for stabilityai/stable-diffusion-xl-base-1.0.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tweediemix_tpu.models.embeddings import TimestepEmbedding, timestep_embedding
from tweediemix_tpu.ops.attention import multi_head_attention
from tweediemix_tpu.ops.quant import (
    QConv,
    QDense,
    module_site,
    quantize_weight_int8,
    sow_amax,
    w8a8_matmul,
)
from tweediemix_tpu.ops.stacked import lora_delta, stacked_linear


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SDXL-base defaults; shrink for tests via ``tiny()``."""

    sample_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "UpBlock2D",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20)
    cross_attention_dim: int = 2048
    norm_num_groups: int = 32
    addition_time_embed_dim: int = 256
    # pooled text-embed width fed to the add_embedding MLP (SDXL: 1280)
    pooled_projection_dim: int = 1280
    # concept fusion knobs (0 = plain SDXL)
    concept_slots: int = 0
    lora_slots: int = 0
    lora_rank: int = 4
    # training: stop-gradient through the first context token's K/V
    # (the Custom-Diffusion detach trick,
    #  concept_training/diffusers_model_pipeline_xl_new.py:93-97)
    detach_first_token_kv: bool = False
    # training: rematerialize resnet/transformer blocks in the backward pass
    # (the reference's --gradient_checkpointing, singleconcept_train.sh:20)
    remat: bool = False
    # serving: "int8" runs the transformer matmuls (qkv/out, GEGLU, proj)
    # as dynamic W8A8 on the MXU's int8 path (ops/quant.py); "int8_conv"
    # additionally quantizes the resnet 3×3 + resample convs (coarser
    # per-sample activation scales — see ops/quant.py::w8a8_conv). Params
    # stay fp32 and checkpoint-identical. Opt-in speed/fidelity trade.
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def projection_class_embeddings_input_dim(self) -> int:
        return self.pooled_projection_dim + 6 * self.addition_time_embed_dim

    @staticmethod
    def sdxl(**kw) -> "UNetConfig":
        return UNetConfig(**kw)

    @staticmethod
    def micro(**kw) -> "UNetConfig":
        """Single-level config for fast CPU equivalence tests (shallow, so
        fp32 batched-vs-sliced rounding differences stay ~1e-6)."""
        defaults = dict(
            sample_size=8,
            block_out_channels=(32,),
            down_block_types=("CrossAttnDownBlock2D",),
            up_block_types=("CrossAttnUpBlock2D",),
            layers_per_block=1,
            transformer_layers_per_block=(1,),
            num_attention_heads=(2,),
            cross_attention_dim=32,
            norm_num_groups=8,
            addition_time_embed_dim=8,
            pooled_projection_dim=32,
        )
        defaults.update(kw)
        return UNetConfig(**defaults)

    @staticmethod
    def tiny(**kw) -> "UNetConfig":
        """Small config with SDXL's topology, for CPU tests."""
        defaults = dict(
            sample_size=8,
            block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1,
            transformer_layers_per_block=(1, 2),
            num_attention_heads=(2, 4),
            cross_attention_dim=32,
            norm_num_groups=8,
            addition_time_embed_dim=8,
            pooled_projection_dim=32,
        )
        defaults.update(kw)
        return UNetConfig(**defaults)


class _Kernel(nn.Module):
    """Bare [in, out] kernel with the same param path as an unbiased Dense
    (``<name>/kernel``) so merged-projection attention keeps the checkpoint
    layout."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim),
            jnp.float32,
        )


class Attention(nn.Module):
    """QKV attention with optional concept-stacked K/V and LoRA deltas."""

    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None → self-attention
    concept_slots: int = 0
    lora_slots: int = 0
    lora_rank: int = 4
    detach_first_token_kv: bool = False
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx=None, concept_idx=None, kv=None):
        inner = self.heads * self.dim_head
        is_cross = ctx is not None
        ctx = ctx if is_cross else x
        ctx_dim = self.cross_attention_dim if is_cross else self.query_dim
        b = x.shape[0]
        if concept_idx is None:
            concept_idx = jnp.zeros((b,), dtype=jnp.int32)

        def Dense(features, use_bias=True, name=None):
            if self.quant:
                return QDense(features, use_bias=use_bias, quant=self.quant,
                              dtype=self.dtype, name=name)
            return nn.Dense(features, use_bias=use_bias, dtype=self.dtype,
                            name=name)

        def lora(name, inp, din, dout):
            down = self.param(
                f"{name}_lora_down",
                nn.initializers.normal(1.0 / self.lora_rank),
                (self.lora_slots, din, self.lora_rank),
                jnp.float32,
            )
            up = self.param(
                f"{name}_lora_up",
                nn.initializers.zeros,
                (self.lora_slots, self.lora_rank, dout),
                jnp.float32,
            )
            return lora_delta(inp, down, up, concept_idx)

        if not is_cross:
            # self-attention: one merged [C, 3*inner] matmul instead of three
            # (fewer passes over x, larger MXU tiles); param paths unchanged
            wq = _Kernel(self.query_dim, inner, name="to_q")()
            wk = _Kernel(ctx_dim, inner, name="to_k")()
            wv = _Kernel(ctx_dim, inner, name="to_v")()
            w = jnp.concatenate([wq, wk, wv], axis=1)
            if self.quant in ("int8", "int8_conv"):
                sow_amax(self, x, name="qkv")
                qkv = w8a8_matmul(x, *quantize_weight_int8(w),
                                  site=module_site(self) + "/qkv")
            else:
                qkv = jnp.einsum("bsc,cd->bsd", x, w.astype(self.dtype))
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if self.lora_slots:
                q = q + lora("to_q", x, self.query_dim, inner)
                k = k + lora("to_k", ctx, ctx_dim, inner)
                v = v + lora("to_v", ctx, ctx_dim, inner)
            out = multi_head_attention(q, k, v, self.heads)
            proj = Dense(self.query_dim, name="to_out_0")(out)
            if self.lora_slots:
                proj = proj + lora("to_out", out, inner, self.query_dim)
            return proj

        q = Dense(inner, use_bias=False, name="to_q")(x)
        if kv is not None:
            # precomputed cross-attention K/V (precompute_cross_kv): the text
            # context is loop-invariant across the sampling scan, so the
            # stacked-weight gather + K/V projection (and their LoRA deltas)
            # run once per phase instead of once per step. q-side deltas
            # depend on x and stay in-line.
            if self.lora_slots:
                q = q + lora("to_q", x, self.query_dim, inner)
            k, v = kv
            out = multi_head_attention(q, k, v, self.heads)
            proj = Dense(self.query_dim, name="to_out_0")(out)
            if self.lora_slots:
                proj = proj + lora("to_out", out, inner, self.query_dim)
            return proj
        if self.concept_slots and is_cross:
            wk = self.param(
                "to_k_stack",
                nn.initializers.lecun_normal(),
                (self.concept_slots, ctx_dim, inner),
                jnp.float32,
            )
            wv = self.param(
                "to_v_stack",
                nn.initializers.lecun_normal(),
                (self.concept_slots, ctx_dim, inner),
                jnp.float32,
            )
            k = stacked_linear(ctx, wk.astype(self.dtype), concept_idx)
            v = stacked_linear(ctx, wv.astype(self.dtype), concept_idx)
        else:
            k = Dense(inner, use_bias=False, name="to_k")(ctx)
            v = Dense(inner, use_bias=False, name="to_v")(ctx)

        if self.lora_slots:
            q = q + lora("to_q", x, self.query_dim, inner)
            k = k + lora("to_k", ctx, ctx_dim, inner)
            v = v + lora("to_v", ctx, ctx_dim, inner)

        if self.detach_first_token_kv and is_cross:
            k = jnp.concatenate([jax.lax.stop_gradient(k[:, :1]), k[:, 1:]], axis=1)
            v = jnp.concatenate([jax.lax.stop_gradient(v[:, :1]), v[:, 1:]], axis=1)

        out = multi_head_attention(q, k, v, self.heads)
        proj = Dense(self.query_dim, name="to_out_0")(out)
        if self.lora_slots:
            # LoRA out-delta reads the pre-projection hidden (utils_lora.py:115-119)
            proj = proj + lora("to_out", out, inner, self.query_dim)
        return proj


class FeedForward(nn.Module):
    """GEGLU MLP (diffusers ``FeedForward`` with geglu activation)."""

    dim: int
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * 4
        if self.quant:
            D = lambda f, name: QDense(f, quant=self.quant, dtype=self.dtype, name=name)
        else:
            D = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        x = D(hidden * 2, "net_0_proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        x = x * nn.gelu(gate, approximate=False)
        return D(self.dim, "net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    concept_slots: int = 0
    lora_slots: int = 0
    lora_rank: int = 4
    detach_first_token_kv: bool = False
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, concept_idx, kv=None):
        attn_kw = dict(
            query_dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            lora_slots=self.lora_slots,
            lora_rank=self.lora_rank,
            quant=self.quant,
            dtype=self.dtype,
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(name="attn1", **attn_kw)(h, None, concept_idx)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            name="attn2",
            cross_attention_dim=self.cross_attention_dim,
            concept_slots=self.concept_slots,
            detach_first_token_kv=self.detach_first_token_kv,
            **attn_kw,
        )(h, ctx, concept_idx, kv=kv)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dim, quant=self.quant, dtype=self.dtype, name="ff")(h)


class Transformer2DModel(nn.Module):
    """Spatial transformer with linear projections (SDXL uses
    ``use_linear_projection=True``)."""

    heads: int
    dim_head: int
    num_layers: int
    cross_attention_dim: int
    norm_num_groups: int
    concept_slots: int = 0
    lora_slots: int = 0
    lora_rank: int = 4
    detach_first_token_kv: bool = False
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, concept_idx, kv=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        if self.quant:
            D = lambda f, name: QDense(f, quant=self.quant, dtype=self.dtype, name=name)
        else:
            D = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        x = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x)
        x = x.reshape(b, h * w, c)
        x = D(inner, "proj_in")(x)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                concept_slots=self.concept_slots,
                lora_slots=self.lora_slots,
                lora_rank=self.lora_rank,
                detach_first_token_kv=self.detach_first_token_kv,
                quant=self.quant,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, ctx, concept_idx, kv=None if kv is None else (kv[0][i], kv[1][i]))
        x = D(c, "proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class ResnetBlock2D(nn.Module):
    out_channels: int
    norm_num_groups: int
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        # "int8_conv" quantizes the two 3×3 convs; the shortcut stays exact
        # so the residual path carries no quantization error of its own
        Conv = _quant_conv3x3(self.quant, self.dtype)
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-5, dtype=self.dtype, name="norm1"
        )(x)
        h = nn.silu(h)
        h = Conv(self.out_channels, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-5, dtype=self.dtype, name="norm2"
        )(h)
        h = nn.silu(h)
        h = Conv(self.out_channels, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


def _quant_conv3x3(quant, dtype, strides=(1, 1)):
    """3×3 same-pad conv factory: ``QConv`` under "int8_conv", else
    ``nn.Conv`` (identical param tree either way)."""
    if quant == "int8_conv":
        return functools.partial(
            QConv, kernel_size=(3, 3), strides=strides,
            padding=((1, 1), (1, 1)), quant=quant, dtype=dtype,
        )
    return functools.partial(
        nn.Conv, kernel_size=(3, 3), strides=strides,
        padding=((1, 1), (1, 1)), dtype=dtype,
    )


class Downsample2D(nn.Module):
    out_channels: int
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _quant_conv3x3(self.quant, self.dtype, strides=(2, 2))(
            self.out_channels, name="conv"
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    quant: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # exact nearest-2x via broadcast+reshape (jax.image.resize lowers to
        # a gather, which tiles poorly on TPU)
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, h * 2, w * 2, c)
        return _quant_conv3x3(self.quant, self.dtype)(
            self.out_channels, name="conv"
        )(x)


class UNet2DConditionModel(nn.Module):
    """SDXL denoising UNet.

    Call: ``(sample [B,H,W,4], timestep [] or [B], encoder_hidden_states
    [B,S,ctx], pooled [B,pooled_dim], time_ids [B,6], concept_idx [B])``
    → eps prediction [B,H,W,4].
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        pooled_projections: jnp.ndarray,
        time_ids: jnp.ndarray,
        concept_idx: Optional[jnp.ndarray] = None,
        cross_kv: Optional[dict] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        b = sample.shape[0]
        if concept_idx is None:
            concept_idx = jnp.zeros((b,), dtype=jnp.int32)
        timestep = jnp.broadcast_to(jnp.asarray(timestep), (b,))

        # --- time + added (size/pooled) conditioning ---
        t_emb = timestep_embedding(timestep, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=cfg.dtype, name="time_embedding")(
            t_emb.astype(cfg.dtype)
        )
        ids_emb = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        ids_emb = ids_emb.reshape(b, 6 * cfg.addition_time_embed_dim)
        add_emb = jnp.concatenate([pooled_projections, ids_emb.astype(pooled_projections.dtype)], axis=-1)
        temb = temb + TimestepEmbedding(cfg.time_embed_dim, dtype=cfg.dtype, name="add_embedding")(
            add_emb.astype(cfg.dtype)
        )

        ctx = encoder_hidden_states.astype(cfg.dtype)
        sample = sample.astype(cfg.dtype)

        # gradient checkpointing: lifted remat preserves param names/shapes
        Resnet = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        Transformer = nn.remat(Transformer2DModel) if cfg.remat else Transformer2DModel

        def transformer(level: int, name: str):
            return Transformer(
                heads=cfg.num_attention_heads[level],
                dim_head=cfg.block_out_channels[level] // cfg.num_attention_heads[level],
                num_layers=cfg.transformer_layers_per_block[level],
                cross_attention_dim=cfg.cross_attention_dim,
                norm_num_groups=cfg.norm_num_groups,
                concept_slots=cfg.concept_slots,
                lora_slots=cfg.lora_slots,
                lora_rank=cfg.lora_rank,
                detach_first_token_kv=cfg.detach_first_token_kv,
                quant=cfg.quant,
                dtype=cfg.dtype,
                name=name,
            )

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_in"
        )(sample)

        # --- down ---
        res_stack = [x]
        n_levels = len(cfg.block_out_channels)
        for level, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[level]
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                x = Resnet(
                    out_ch, cfg.norm_num_groups, quant=cfg.quant,
                    dtype=cfg.dtype,
                    name=f"down_blocks_{level}_resnets_{j}",
                )(x, temb)
                if has_attn:
                    name = f"down_blocks_{level}_attentions_{j}"
                    x = transformer(level, name)(
                        x, ctx, concept_idx,
                        kv=None if cross_kv is None else cross_kv[name],
                    )
                res_stack.append(x)
            if level < n_levels - 1:
                x = Downsample2D(out_ch, quant=cfg.quant, dtype=cfg.dtype, name=f"down_blocks_{level}_downsamplers_0")(x)
                res_stack.append(x)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        x = Resnet(mid_ch, cfg.norm_num_groups, quant=cfg.quant, dtype=cfg.dtype, name="mid_block_resnets_0")(x, temb)
        x = transformer(n_levels - 1, "mid_block_attentions_0")(
            x, ctx, concept_idx,
            kv=None if cross_kv is None else cross_kv["mid_block_attentions_0"],
        )
        x = Resnet(mid_ch, cfg.norm_num_groups, quant=cfg.quant, dtype=cfg.dtype, name="mid_block_resnets_1")(x, temb)

        # --- up ---
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            level = n_levels - 1 - i  # config tuples are indexed by down-level
            out_ch = rev_channels[i]
            has_attn = block_type == "CrossAttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                x = jnp.concatenate([x, res], axis=-1)
                x = Resnet(
                    out_ch, cfg.norm_num_groups, quant=cfg.quant,
                    dtype=cfg.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x, temb)
                if has_attn:
                    name = f"up_blocks_{i}_attentions_{j}"
                    x = transformer(level, name)(
                        x, ctx, concept_idx,
                        kv=None if cross_kv is None else cross_kv[name],
                    )
            if i < n_levels - 1:
                x = Upsample2D(out_ch, quant=cfg.quant, dtype=cfg.dtype, name=f"up_blocks_{i}_upsamplers_0")(x)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)


def cross_attention_names(cfg: UNetConfig):
    """(level, module name) of every Transformer2DModel, in call order."""
    names = []
    n_levels = len(cfg.block_out_channels)
    for level, block_type in enumerate(cfg.down_block_types):
        if block_type == "CrossAttnDownBlock2D":
            for j in range(cfg.layers_per_block):
                names.append((level, f"down_blocks_{level}_attentions_{j}"))
    names.append((n_levels - 1, "mid_block_attentions_0"))
    for i, block_type in enumerate(cfg.up_block_types):
        level = n_levels - 1 - i
        if block_type == "CrossAttnUpBlock2D":
            for j in range(cfg.layers_per_block + 1):
                names.append((level, f"up_blocks_{i}_attentions_{j}"))
    return names


def precompute_cross_kv(cfg: UNetConfig, params, encoder_hidden_states, concept_idx=None):
    """Precompute every attn2's K/V rows from the param tree.

    The text context is constant across a sampling trajectory, so the
    per-row stacked-weight gather (2.3 GB of HBM reads per step for 4 rows
    of full SDXL), the 77-token K/V projections, and the LoRA K/V deltas are
    loop-invariant; computing them once per phase and passing the result as
    ``cross_kv`` removes them from the scan body. Mirrors the attn2 K/V
    computation in ``Attention.__call__`` exactly (equivalence-tested in
    tests/test_unet2d.py).

    Returns {transformer_name: (k [L, B, S, inner], v [L, B, S, inner])}.
    """
    ctx = encoder_hidden_states.astype(cfg.dtype)
    b = ctx.shape[0]
    if concept_idx is None:
        concept_idx = jnp.zeros((b,), dtype=jnp.int32)
    cache = {}
    for level, name in cross_attention_names(cfg):
        ks, vs = [], []
        for layer in range(cfg.transformer_layers_per_block[level]):
            ap = params[name][f"transformer_blocks_{layer}"]["attn2"]

            def kv_one(which):
                if cfg.concept_slots:
                    out = stacked_linear(
                        ctx, ap[f"{which}_stack"].astype(cfg.dtype), concept_idx
                    )
                else:
                    out = ctx @ ap[which]["kernel"].astype(cfg.dtype)
                if cfg.lora_slots:
                    out = out + lora_delta(
                        ctx, ap[f"{which}_lora_down"], ap[f"{which}_lora_up"], concept_idx
                    )
                if cfg.detach_first_token_kv:
                    out = jnp.concatenate(
                        [jax.lax.stop_gradient(out[:, :1]), out[:, 1:]], axis=1
                    )
                return out

            ks.append(kv_one("to_k"))
            vs.append(kv_one("to_v"))
        cache[name] = (jnp.stack(ks), jnp.stack(vs))
    return cache
