"""Flax Swin Transformer backbone (for the GroundingDINO detector).

The reference's detector is GroundingDINO with a Swin-B backbone
(``text_segment/lang_sam/lang_sam.py:89-93``, checkpoint
``groundingdino_swinb_cogcoor.pth``). This is a from-scratch NHWC flax
implementation of the Swin backbone matching HF ``SwinBackbone`` semantics
(window attention with relative position bias, shifted windows with the
cyclic-roll mask, patch merging, per-out-stage LayerNorms applied to the
*pre-downsample* hidden states, ``always_partition=True``), numerically
parity-tested against the genuine torch implementation in
``tests/test_dino_parity.py``.

TPU-first notes: all shapes are static under jit, so the shifted-window
attention masks and relative-position index are precomputed as numpy
constants at trace time (no dynamic control flow); window partitioning is
pure reshape/transpose, which XLA folds into the attention fusions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 384
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    # which stages feed the detector (1-indexed over stages, diffusers/HF
    # convention: stage i outputs embed_dim * 2**(i-1) channels). Grounding
    # DINO uses the last three stages (out_indices=[2, 3, 4]).
    out_indices: Tuple[int, ...] = (2, 3, 4)

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in range(len(self.depths)))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return tuple(self.stage_dims[i - 1] for i in self.out_indices)

    @staticmethod
    def swin_b(**kw) -> "SwinConfig":
        """Swin-B 384 (the groundingdino_swinb_cogcoor backbone)."""
        return SwinConfig(**kw)

    @staticmethod
    def swin_t(**kw) -> "SwinConfig":
        """Swin-T 224 (IDEA-Research/grounding-dino-tiny's backbone)."""
        defaults = dict(image_size=224, embed_dim=96, depths=(2, 2, 6, 2),
                        num_heads=(3, 6, 12, 24), window_size=7)
        defaults.update(kw)
        return SwinConfig(**defaults)

    @staticmethod
    def tiny(**kw) -> "SwinConfig":
        """Micro config for CPU parity tests (covers shifted windows)."""
        defaults = dict(image_size=32, patch_size=4, embed_dim=8,
                        depths=(2, 2), num_heads=(2, 2), window_size=2,
                        out_indices=(1, 2))
        defaults.update(kw)
        return SwinConfig(**defaults)


def _rel_pos_index(window: int) -> np.ndarray:
    """[ws*ws, ws*ws] lookup into the (2w-1)^2 relative-position table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def _shift_attn_mask(height: int, width: int, window: int, shift: int) -> np.ndarray:
    """Additive (-100/0) mask for shifted-window attention, [nW, ws*ws, ws*ws]."""
    img = np.zeros((height, width))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws_ in slices:
            img[hs, ws_] = count
            count += 1
    img = img.reshape(height // window, window, width // window, window)
    win = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] → [B * nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // window, w // window, window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


class SwinWindowAttention(nn.Module):
    """Window self-attention with relative position bias (HF SwinAttention:
    self.{query,key,value} + output.dense)."""

    dim: int
    heads: int
    window: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # x: [B*nW, ws*ws, C]; attn_mask: [nW, ws*ws, ws*ws] additive or None
        n, s, c = x.shape
        dh = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, name="key")(x)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, name="value")(x)

        def heads(t):
            return t.reshape(n, s, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(dh)

        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.heads), jnp.float32,
        )
        idx = _rel_pos_index(self.window)  # static numpy
        bias = table[idx.reshape(-1)].reshape(s, s, self.heads)
        scores = scores + bias.transpose(2, 0, 1)[None]

        if attn_mask is not None:
            nw = attn_mask.shape[0]
            scores = scores.reshape(n // nw, nw, self.heads, s, s)
            scores = scores + attn_mask[None, :, None]
            scores = scores.reshape(n, self.heads, s, s)

        p = nn.softmax(scores, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, s, self.dim)
        return nn.Dense(self.dim, name="out")(out)


class SwinBlock(nn.Module):
    """One Swin layer: LN → (shifted-)window attention → residual →
    LN → GELU MLP → residual."""

    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    eps: float

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=self.eps, name="layernorm_before")(x)

        pad_b = (self.window - h % self.window) % self.window
        pad_r = (self.window - w % self.window) % self.window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, self.window, self.shift))
        else:
            mask = None

        win = _window_partition(x, self.window)
        win = SwinWindowAttention(
            self.dim, self.heads, self.window, self.qkv_bias, name="attention"
        )(win, mask)
        x = _window_reverse(win, self.window, hp, wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]

        x = shortcut + x
        y = nn.LayerNorm(epsilon=self.eps, name="layernorm_after")(x)
        y = nn.Dense(int(self.mlp_ratio * self.dim), name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="output")(y)
        return x + y


class SwinPatchMerging(nn.Module):
    """Concat 2x2 neighborhoods → LN → Linear 4C→2C (no bias)."""

    dim: int
    eps: float

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        # HF slice order: (even h, even w), (odd h, even w), (even h, odd w),
        # (odd h, odd w) — modeling_swin.py SwinPatchMerging.forward
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinBackbone(nn.Module):
    """Patch embed + stages; returns the out_indices stages' pre-downsample
    features, each LayerNorm'd (HF SwinBackbone), as NHWC maps."""

    config: SwinConfig

    @nn.compact
    def __call__(self, pixel_values):  # [B, H, W, 3]
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), name="patch_embed")(
            pixel_values
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_norm")(x)

        feature_maps = []
        for i, depth in enumerate(cfg.depths):
            dim = cfg.stage_dims[i]
            for j in range(depth):
                x = SwinBlock(
                    dim=dim, heads=cfg.num_heads[i], window=cfg.window_size,
                    shift=0 if j % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    eps=cfg.layer_norm_eps, name=f"layers_{i}_blocks_{j}",
                )(x)
            if (i + 1) in cfg.out_indices:
                y = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, name=f"norm_stage{i + 1}"
                )(x)
                feature_maps.append(y)
            if i < len(cfg.depths) - 1:
                x = SwinPatchMerging(dim, cfg.layer_norm_eps,
                                     name=f"layers_{i}_downsample")(x)
        return tuple(feature_maps)
