"""Flax video UNet for image-to-video generation (I2VGen-XL stage).

A TPU-first redesign of the UNet behind the reference's modified I2VGen-XL
pipeline (``video_gen/pipeline_i2vgen_xl.py``; model loaded from HF at
``run_video.py:21-22``). Same conditioning contract as the reference UNet:

* ``sample`` [B, F, h, w, 4] noisy video latents;
* ``image_latents`` [B, F, h, w, 4]: frame 0 = VAE latent of the
  conditioning image, frames 1..F-1 = the linear frame-position ramp
  (``pipeline_i2vgen_xl.py:421-451``) — concatenated on channels at conv_in;
* ``image_embeddings`` [B, 1, D]: CLIP image embedding, appended to the
  text context as an extra cross-attention token (``:300-330``);
* ``fps`` scalar conditioning added to the time embedding (``:640-646``);
* first-frame feature injection is a *function argument* instead of the
  reference's runtime resnet patch (``video_gen/utils_attn.py:389-474``):
  ``inject_copy`` hard-copies frame-0 features to all frames after the mid
  resnets, ``inject_interp``/``interp_ratio`` blends them after the first
  resnet of up level 1.

Internally each level runs: spatial resnet (frames folded into batch) →
temporal conv (1D over frames, zero-init final conv so temporal layers
start as identity) → spatial transformer → temporal transformer
(cross-frame attention, the temporal-consistency primitive). Channel/level
layout mirrors I2VGen-XL (320/640/1280/1280, heads = ch/64, ctx 1024).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from tweediemix_tpu.models.embeddings import TimestepEmbedding, timestep_embedding
from tweediemix_tpu.models.unet2d import (
    Downsample2D,
    ResnetBlock2D,
    Transformer2DModel,
    Upsample2D,
)
from tweediemix_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @property
    def up_block_types(self):
        return tuple(
            {"CrossAttnDownBlock3D": "CrossAttnUpBlock3D", "DownBlock3D": "UpBlock3D"}[t]
            for t in reversed(self.down_block_types)
        )

    @property
    def time_embed_dim(self):
        return self.block_out_channels[0] * 4

    @staticmethod
    def i2vgen(**kw) -> "UNet3DConfig":
        return UNet3DConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "UNet3DConfig":
        defaults = dict(
            block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
            layers_per_block=1,
            attention_head_dim=16,
            cross_attention_dim=32,
            norm_num_groups=8,
        )
        defaults.update(kw)
        return UNet3DConfig(**defaults)


def fold_frames(x):
    """[B, F, H, W, C] → [B*F, H, W, C]."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c)


def unfold_frames(x, b):
    bf, h, w, c = x.shape
    return x.reshape(b, bf // b, h, w, c)


class TemporalConv(nn.Module):
    """Two GN→SiLU→conv1d-over-frames blocks, residual, zero-init out."""

    channels: int
    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, F, H, W, C]
        b, f, h, w, c = x.shape
        res = x
        # frames on a conv axis: [B, H, W, F, C] → Conv over F
        y = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        y = nn.silu(y)
        y = nn.Conv(self.channels, (3,), padding=((1, 1),), dtype=self.dtype, name="conv1")(y)
        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        y = nn.silu(y)
        y = nn.Conv(
            self.channels, (3,), padding=((1, 1),), dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv2",
        )(y)
        y = y.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return res + y


class TemporalAttention(nn.Module):
    """Self-attention across the frame axis (cross-frame attention)."""

    channels: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, F, H, W, C]
        b, f, h, w, c = x.shape
        res = x
        y = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(y)
        o = multi_head_attention(q, k, v, self.heads)
        o = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="to_out_0")(o)
        o = o.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return res + o


def _inject_first_frame(x, inject_copy, inject_interp, interp_ratio):
    """First-frame feature injection (utils_attn.py:433-455) as pure math.

    inject_copy / inject_interp are 0/1 scalars (traced); when both 0 this
    is the identity."""
    first = x[:, :1]
    copied = jnp.broadcast_to(first, x.shape)
    interp = interp_ratio * copied + (1.0 - interp_ratio) * x
    keep_frame0 = jnp.concatenate([x[:, :1], interp[:, 1:]], axis=1)
    copy_full = jnp.concatenate([x[:, :1], copied[:, 1:]], axis=1)
    out = jnp.where(inject_interp > 0, keep_frame0, x)
    return jnp.where(inject_copy > 0, copy_full, out)


class UNet3DConditionModel(nn.Module):
    config: UNet3DConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, h, w, 4]
        timestep,
        encoder_hidden_states: jnp.ndarray,  # [B, S, ctx]
        image_latents: jnp.ndarray,  # [B, F, h, w, 4]
        image_embeddings: jnp.ndarray,  # [B, 1, ctx]
        fps: jnp.ndarray,  # [] or [B]
        inject_copy=0.0,
        inject_interp=0.0,
        interp_ratio: float = 0.7,
    ) -> jnp.ndarray:
        cfg = self.config
        b, f = sample.shape[:2]
        timestep = jnp.broadcast_to(jnp.asarray(timestep), (b,))
        fps = jnp.broadcast_to(jnp.asarray(fps, jnp.float32), (b,))

        t_emb = timestep_embedding(timestep, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=cfg.dtype, name="time_embedding")(
            t_emb.astype(cfg.dtype)
        )
        fps_emb = timestep_embedding(fps, cfg.block_out_channels[0])
        temb = temb + TimestepEmbedding(cfg.time_embed_dim, dtype=cfg.dtype, name="fps_embedding")(
            fps_emb.astype(cfg.dtype)
        )
        temb_f = jnp.repeat(temb, f, axis=0)  # per folded frame

        # context: text tokens + one image token
        img_tok = nn.Dense(cfg.cross_attention_dim, dtype=cfg.dtype, name="image_context_proj")(
            image_embeddings.astype(cfg.dtype)
        )
        ctx = jnp.concatenate([encoder_hidden_states.astype(cfg.dtype), img_tok], axis=1)
        ctx_f = jnp.repeat(ctx, f, axis=0)

        x = jnp.concatenate([sample, image_latents], axis=-1).astype(cfg.dtype)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=cfg.dtype, name="conv_in",
        )(fold_frames(x))
        x = unfold_frames(x, b)

        def spatial_resnet(name, ch, x):
            return unfold_frames(
                ResnetBlock2D(ch, cfg.norm_num_groups, dtype=cfg.dtype, name=name)(
                    fold_frames(x), temb_f
                ), b,
            )

        def spatial_attn(name, level, x):
            ch = cfg.block_out_channels[level]
            heads = max(1, ch // cfg.attention_head_dim)
            return unfold_frames(
                Transformer2DModel(
                    heads=heads, dim_head=cfg.attention_head_dim, num_layers=1,
                    cross_attention_dim=cfg.cross_attention_dim,
                    norm_num_groups=cfg.norm_num_groups, dtype=cfg.dtype, name=name,
                )(fold_frames(x), ctx_f, None), b,
            )

        def temporal(name, ch, level, x):
            heads = max(1, ch // cfg.attention_head_dim)
            x = TemporalConv(ch, cfg.norm_num_groups, dtype=cfg.dtype, name=f"{name}_temp_conv")(x)
            return TemporalAttention(ch, heads, dtype=cfg.dtype, name=f"{name}_temp_attn")(x)

        n_levels = len(cfg.block_out_channels)
        res_stack = [x]
        for level, btype in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[level]
            has_attn = btype == "CrossAttnDownBlock3D"
            for j in range(cfg.layers_per_block):
                x = spatial_resnet(f"down_blocks_{level}_resnets_{j}", ch, x)
                x = temporal(f"down_blocks_{level}_{j}", ch, level, x)
                if has_attn:
                    x = spatial_attn(f"down_blocks_{level}_attentions_{j}", level, x)
                res_stack.append(x)
            if level < n_levels - 1:
                x = unfold_frames(
                    Downsample2D(ch, dtype=cfg.dtype, name=f"down_blocks_{level}_downsamplers_0")(
                        fold_frames(x)
                    ), b,
                )
                res_stack.append(x)

        # mid (+ hard-copy injection after the mid resnets,
        # utils_attn.py:433-443)
        mid_ch = cfg.block_out_channels[-1]
        x = spatial_resnet("mid_block_resnets_0", mid_ch, x)
        x = _inject_first_frame(x, inject_copy, 0.0, interp_ratio)
        x = temporal("mid_block_0", mid_ch, n_levels - 1, x)
        x = spatial_attn("mid_block_attentions_0", n_levels - 1, x)
        x = spatial_resnet("mid_block_resnets_1", mid_ch, x)
        x = _inject_first_frame(x, inject_copy, 0.0, interp_ratio)
        x = temporal("mid_block_1", mid_ch, n_levels - 1, x)

        rev = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            level = n_levels - 1 - i
            ch = rev[i]
            has_attn = btype == "CrossAttnUpBlock3D"
            for j in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                x = jnp.concatenate([x, res], axis=-1)
                x = spatial_resnet(f"up_blocks_{i}_resnets_{j}", ch, x)
                if i == 1 and j == 0:
                    # interpolated injection after up_blocks[1].resnets[0]
                    # (utils_attn.py:445-455)
                    x = _inject_first_frame(x, 0.0, inject_interp, interp_ratio)
                x = temporal(f"up_blocks_{i}_{j}", ch, level, x)
                if has_attn:
                    x = spatial_attn(f"up_blocks_{i}_attentions_{j}", level, x)
            if i < n_levels - 1:
                x = unfold_frames(
                    Upsample2D(ch, dtype=cfg.dtype, name=f"up_blocks_{i}_upsamplers_0")(
                        fold_frames(x)
                    ), b,
                )

        y = fold_frames(x)
        y = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=cfg.dtype, name="conv_norm_out")(y)
        y = nn.silu(y)
        y = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_out")(y)
        return unfold_frames(y, b).astype(jnp.float32)
