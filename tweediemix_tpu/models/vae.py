"""Flax AutoencoderKL (SDXL VAE) — encoder, decoder, sampling posterior.

The reference uses two VAEs: the fp16-fix decode VAE
(``fusion_generation/fusion_sampling.py:123``) and the training encoder
(``concept_training/diffusers_training_xl_new.py``). Decoding always runs
fp32 (mirroring ``upcast_vae``, ``fusion_sampling.py:226-243``); the
mid-trajectory Tweedie preview decode uses the reference's 1/0.18215
scaling quirk (``fusion_sampling.py:297-303``) while the final decode uses
the configured ``scaling_factor`` (0.13025 for SDXL,
``sample_loop`` :507-518).

NHWC layout; latents are [B, h, w, 4].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025
    # the reference's Tweedie-preview decode scale (fusion_sampling.py:300)
    preview_scaling_factor: float = 0.18215
    # optional per-channel latent statistics: some VAE checkpoints configure
    # latents_mean/latents_std, and the reference's final decode denormalizes
    # with them (fusion_sampling.py:505-518). None for the default SDXL /
    # fp16-fix VAEs (their configs carry neither).
    latents_mean: Tuple[float, ...] | None = None
    latents_std: Tuple[float, ...] | None = None
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sdxl(**kw) -> "VAEConfig":
        return VAEConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "VAEConfig":
        defaults = dict(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)
        defaults.update(kw)
        return VAEConfig(**defaults)


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block."""

    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        s = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjd->bid", p, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + res


class VAEDownsample(nn.Module):
    """Strided conv with diffusers' asymmetric (0,1) padding."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class VAEUpsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = VAEDownsample(ch, cfg.dtype, name=f"down_blocks_{i}_downsamplers_0")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_block_resnets_0")(x)
        x = VAEAttention(cfg.norm_num_groups, cfg.dtype, name="mid_block_attentions_0")(x)
        x = VAEResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name="mid_block_resnets_1")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_in")(z)
        x = VAEResnetBlock(rev[0], cfg.norm_num_groups, cfg.dtype, name="mid_block_resnets_0")(x)
        x = VAEAttention(cfg.norm_num_groups, cfg.dtype, name="mid_block_attentions_0")(x)
        x = VAEResnetBlock(rev[0], cfg.norm_num_groups, cfg.dtype, name="mid_block_resnets_1")(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, cfg.norm_num_groups, cfg.dtype, name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = VAEUpsample(ch, cfg.dtype, name=f"up_blocks_{i}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode → (mean, logvar) via quant_conv; decode via post_quant_conv."""

    config: VAEConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1), dtype=cfg.dtype, name="post_quant_conv")

    def encode(self, x):
        """[B,H,W,3] → (mean, logvar) each [B,H/8,W/8,4] (pre-scaling)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        """[B,h,w,4] (pre-scaled) → [B,H,W,3] in [-1, 1] range."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar


def sample_posterior(mean, logvar, rng):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)


def scale_latents(latents, cfg: VAEConfig):
    """encoder output → diffusion latent space (training convention)."""
    return latents * cfg.scaling_factor


def unscale_latents(latents, cfg: VAEConfig, preview: bool = False):
    """diffusion latent → decoder input. ``preview=True`` reproduces the
    reference's 1/0.18215 Tweedie-preview scale (fusion_sampling.py:300).

    When the VAE config carries ``latents_mean``/``latents_std``, the final
    decode denormalizes with them exactly like the reference
    (``x * latents_std / scaling_factor + latents_mean``,
    fusion_sampling.py:505-518); the preview path keeps the plain scale, as
    the reference's ``decode_latent`` does (fusion_sampling.py:297-303).
    Channel statistics broadcast over the trailing (NHWC) channel axis."""
    if preview:
        return latents / cfg.preview_scaling_factor
    if cfg.latents_mean is not None and cfg.latents_std is not None:
        mean = jnp.asarray(cfg.latents_mean, latents.dtype)
        std = jnp.asarray(cfg.latents_std, latents.dtype)
        return latents * std / cfg.scaling_factor + mean
    return latents / cfg.scaling_factor


def postprocess_image(img):
    """decoder output [-1,1] → [0,1] clamped (image_processor.postprocess)."""
    return jnp.clip(img / 2 + 0.5, 0.0, 1.0)
