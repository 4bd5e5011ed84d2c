"""Flax SAM (Segment Anything) — image encoder, prompt encoder, mask decoder.

TPU rebuild of the reference's SAM ViT-H stage (``text_segment/lang_sam/
lang_sam.py:63-87,121-131``: box-prompted mask prediction on a second GPU).
The structure follows segment-anything's three-part design:

* ``SAMImageEncoder``: ViT over 16x16 patches with absolute positional
  embeddings, window attention, and SAM's decomposed relative-position
  biases (zero-init tables per block, matching upstream's layout so
  checkpoint conversion is a rename+transpose pass).
* ``SAMPromptEncoder``: random-Fourier positional encoding; a box becomes
  two corner points with learned corner embeddings (sparse prompts).
* ``SAMMaskDecoder``: two-way transformer (token self-attn, token→image
  cross-attn, MLP, image→token cross-attn) with mask + IoU tokens,
  2x-upscaling deconvs and a hypernetwork head.

Everything is jittable with static shapes: boxes arrive as a fixed-size
array, masks return at image resolution via bilinear resize.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    image_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280  # ViT-H
    encoder_layers: int = 32
    encoder_heads: int = 16
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_rel_pos: bool = True
    prompt_dim: int = 256
    decoder_layers: int = 2
    # upstream downsamples cross-attention to prompt_dim/2 internally
    attention_downsample_rate: int = 2
    decoder_heads: int = 8
    num_mask_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def vit_h(**kw) -> "SAMConfig":
        return SAMConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "SAMConfig":
        defaults = dict(
            image_size=64, patch_size=8, encoder_dim=32, encoder_layers=2,
            encoder_heads=2, window_size=4, global_attn_indexes=(1,),
            prompt_dim=16, decoder_heads=2,
        )
        defaults.update(kw)
        return SAMConfig(**defaults)


def window_partition(x, win: int):
    """[B, H, W, C] → [B*nw, win, win, C], zero-padding H/W up to multiples
    of ``win`` exactly like upstream segment_anything (padded tokens simply
    participate in the window attention and are sliced off afterwards —
    ViT-H has grid 64 with window 14)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % win, (-w) % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)


def window_unpartition(x, win: int, hw: Tuple[int, int]):
    h, w = hw
    hp, wp = h + (-h) % win, w + (-w) % win
    b = x.shape[0] // (hp // win * wp // win)
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_bias(q, rel_h, rel_w, gh: int, gw: int, heads: int):
    """SAM's decomposed relative-position bias.

    q: [B*, gh*gw, C] (per window or global); rel_h: [2*gh-1, hd];
    returns bias [B* * heads, gh*gw, gh*gw]. Equal q/k sizes, so the
    table index is simply (q_idx - k_idx + size - 1)."""
    bsz, _, c = q.shape
    hd = c // heads
    qr = q.reshape(bsz, gh, gw, heads, hd)
    idx_h = (jnp.arange(gh)[:, None] - jnp.arange(gh)[None, :]) + gh - 1
    idx_w = (jnp.arange(gw)[:, None] - jnp.arange(gw)[None, :]) + gw - 1
    Rh = rel_h[idx_h]  # [gh, gh, hd]
    Rw = rel_w[idx_w]  # [gw, gw, hd]
    bh = jnp.einsum("bhwnc,hkc->bnhwk", qr, Rh.astype(qr.dtype))
    bw = jnp.einsum("bhwnc,wkc->bnhwk", qr, Rw.astype(qr.dtype))
    bias = bh[..., :, None] + bw[:, :, :, :, None, :]  # [b,n,gh,gw,gh,gw]
    return bias.reshape(bsz * heads, gh * gw, gh * gw)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    window_size: int  # 0 = global attention
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        res = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            x = window_partition(x, self.window_size)
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(x.shape[0], -1, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.use_rel_pos:
            hd = c // self.heads
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * gh - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * gw - 1, hd), jnp.float32)
            from tweediemix_tpu.ops.attention import merge_heads, split_heads

            qs, ks, vs = (split_heads(a, self.heads) for a in (q, k, v))
            s = jnp.einsum(
                "bid,bjd->bij", qs, ks, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            s = s + _rel_pos_bias(q, rel_h, rel_w, gh, gw, self.heads).astype(jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(vs.dtype)
            o = merge_heads(jnp.einsum("bij,bjd->bid", p, vs), self.heads)
        else:
            o = multi_head_attention(q, k, v, self.heads)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        o = o.reshape(x.shape)
        if self.window_size > 0:
            o = window_unpartition(o, self.window_size, (h, w))
        x = res + o
        res = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = nn.Dense(4 * c, dtype=self.dtype, name="mlp_lin1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(c, dtype=self.dtype, name="mlp_lin2")(x)
        return res + x


class SAMImageEncoder(nn.Module):
    config: SAMConfig

    @nn.compact
    def __call__(self, pixels):  # [B, S, S, 3] normalized
        cfg = self.config
        g = cfg.grid
        x = nn.Conv(
            cfg.encoder_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), dtype=cfg.dtype,
            name="patch_embed",
        )(pixels.astype(cfg.dtype))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g, g, cfg.encoder_dim), jnp.float32)
        x = x + pos.astype(cfg.dtype)
        for i in range(cfg.encoder_layers):
            win = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = ViTBlock(cfg.encoder_dim, cfg.encoder_heads, win,
                         use_rel_pos=cfg.use_rel_pos, dtype=cfg.dtype,
                         name=f"blocks_{i}")(x)
        # neck → prompt_dim channels
        x = nn.Conv(cfg.prompt_dim, (1, 1), use_bias=False, dtype=cfg.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="neck_norm1")(x)
        x = nn.Conv(cfg.prompt_dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=cfg.dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="neck_norm2")(x)
        return x  # [B, g, g, prompt_dim]


class SAMPromptEncoder(nn.Module):
    config: SAMConfig

    def fourier(self, coords):  # coords in [0,1], [..., 2]
        mat = self.param("pe_gaussian", nn.initializers.normal(1.0),
                         (2, self.config.prompt_dim // 2), jnp.float32)
        proj = (2.0 * coords - 1.0) @ mat * (2 * np.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    @nn.compact
    def __call__(self, boxes):  # [B, 4] xyxy in [0,1]
        """→ (sparse corner embeddings [B, 2, D], no-mask dense embed [D]).

        The dense embedding is upstream's learned ``no_mask_embed`` constant,
        added per-channel to the image features when no mask prompt is given
        (prompt_encoder.py:_get_dense_pe path)."""
        cfg = self.config
        corners = boxes.reshape(-1, 2, 2)  # two corner points
        pe = self.fourier(corners)  # [B, 2, D]
        corner_emb = self.param("corner_embed", nn.initializers.normal(0.02),
                                (2, cfg.prompt_dim), jnp.float32)
        no_mask = self.param("no_mask_embed", nn.initializers.normal(0.02),
                             (cfg.prompt_dim,), jnp.float32)
        return pe + corner_emb[None], no_mask

    @nn.compact
    def dense_pe(self, grid: int):
        """Positional encoding of the image grid for the decoder."""
        coords = (jnp.stack(
            jnp.meshgrid(jnp.arange(grid), jnp.arange(grid), indexing="xy"), -1
        ) + 0.5) / grid
        return self.fourier(coords)  # [g, g, D]


class SAMAttention(nn.Module):
    """q/k/v/out projection attention with upstream's internal downsample
    (cross-attention runs at dim/downsample_rate; names match
    segment-anything's ``Attention`` for checkpoint conversion)."""

    dim: int
    heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample_rate
        o = multi_head_attention(
            nn.Dense(inner, dtype=self.dtype, name="q_proj")(q),
            nn.Dense(inner, dtype=self.dtype, name="k_proj")(k),
            nn.Dense(inner, dtype=self.dtype, name="v_proj")(v),
            self.heads,
        )
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(o)


class TwoWayBlock(nn.Module):
    dim: int
    heads: int
    downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe, first: bool):
        # token self-attention (full dim). Upstream's first layer REPLACES
        # the queries with the attention output (no residual, no PE —
        # two_way_transformer.py skip_first_layer_pe)
        q = tokens + (0.0 if first else token_pe)
        attn = SAMAttention(self.dim, self.heads, 1, self.dtype, name="self_attn")(
            q, q, tokens)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            attn if first else tokens + attn)
        # token → image cross-attention (downsampled)
        attn = SAMAttention(self.dim, self.heads, self.downsample_rate, self.dtype,
                            name="cross_attn_token_to_image")(
            tokens + token_pe, image + image_pe, image)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm2")(tokens + attn)
        # MLP (mlp_dim = 8*dim = 2048 at dim 256, matching upstream)
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name="mlp_lin1")(tokens)
        h = nn.relu(h)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tokens + nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(h))
        # image → token cross-attention (downsampled)
        attn = SAMAttention(self.dim, self.heads, self.downsample_rate, self.dtype,
                            name="cross_attn_image_to_token")(
            image + image_pe, tokens + token_pe, tokens)
        image = nn.LayerNorm(dtype=self.dtype, name="norm4")(image + attn)
        return tokens, image


class SAMMaskDecoder(nn.Module):
    config: SAMConfig

    @nn.compact
    def __call__(self, image_feats, image_pe, sparse_prompts):
        """image_feats [B, g, g, D], image_pe [g, g, D], sparse [B, P, D]
        → (masks [B, M, 4g, 4g] logits, iou [B, M])."""
        cfg = self.config
        b, g, _, d = image_feats.shape
        m = cfg.num_mask_tokens
        iou_tok = self.param("iou_token", nn.initializers.normal(0.02), (1, d), jnp.float32)
        mask_toks = self.param("mask_tokens", nn.initializers.normal(0.02), (m, d), jnp.float32)
        out_tokens = jnp.concatenate([iou_tok, mask_toks], axis=0)
        tokens = jnp.concatenate(
            [jnp.tile(out_tokens[None], (b, 1, 1)).astype(image_feats.dtype), sparse_prompts],
            axis=1,
        )
        image = image_feats.reshape(b, g * g, d)
        img_pe = jnp.tile(image_pe.reshape(1, g * g, d), (b, 1, 1))
        tok_pe = tokens  # SAM uses the initial tokens as their own PE

        for i in range(cfg.decoder_layers):
            tokens, image = TwoWayBlock(
                d, cfg.decoder_heads, cfg.attention_downsample_rate, cfg.dtype,
                name=f"layers_{i}")(tokens, image, tok_pe, img_pe, i == 0)
        # final token→image attention (downsampled like upstream)
        attn = SAMAttention(d, cfg.decoder_heads, cfg.attention_downsample_rate,
                            cfg.dtype, name="final_attn_token_to_image")(
            tokens + tok_pe, image + img_pe, image)
        tokens = nn.LayerNorm(dtype=cfg.dtype, name="norm_final_attn")(tokens + attn)

        iou_token, mask_tokens = tokens[:, 0], tokens[:, 1 : 1 + m]

        # upscale image features 4x
        img = image.reshape(b, g, g, d)
        img = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), dtype=cfg.dtype, name="up1")(img)
        img = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="up_norm")(img)
        img = jax.nn.gelu(img, approximate=False)
        img = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), dtype=cfg.dtype, name="up2")(img)
        img = jax.nn.gelu(img, approximate=False)  # [B, 4g, 4g, d/8]

        # hypernetwork: per mask token → d/8 weights
        hyper = []
        for i in range(m):
            h = mask_tokens[:, i]
            for j, width in enumerate([d, d, d // 8]):
                h = nn.Dense(width, dtype=cfg.dtype, name=f"hyper_{i}_lin{j}")(h)
                if j < 2:
                    h = nn.relu(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)  # [B, M, d/8]
        masks = jnp.einsum("bmd,bhwd->bmhw", hyper, img)

        iou = iou_token
        for j, width in enumerate([d, d, m]):
            iou = nn.Dense(width, dtype=cfg.dtype, name=f"iou_lin{j}")(iou)
            if j < 2:
                iou = nn.relu(iou)
        return masks, iou


class SAM(nn.Module):
    """Box-prompted segmentation: (image, boxes) → best mask per box."""

    config: SAMConfig

    def setup(self):
        self.image_encoder = SAMImageEncoder(self.config, name="image_encoder")
        self.prompt_encoder = SAMPromptEncoder(self.config, name="prompt_encoder")
        self.mask_decoder = SAMMaskDecoder(self.config, name="mask_decoder")

    def encode_image(self, pixels):
        return self.image_encoder(pixels)

    def decode_boxes(self, image_feats, boxes):
        """image_feats [1, g, g, D], boxes [N, 4] xyxy in [0,1] →
        (mask logits [N, 4g, 4g], iou [N]).

        Uses mask token 0 — the reference calls the predictor with
        ``multimask_output=False`` (text_segment/lang_sam/lang_sam.py:129),
        which slices the single-mask output."""
        g = image_feats.shape[1]
        sparse, no_mask = self.prompt_encoder(boxes)  # [N, 2, D], [D]
        image_pe = self.prompt_encoder.dense_pe(g)
        feats = jnp.tile(image_feats, (boxes.shape[0], 1, 1, 1)) + no_mask
        masks, iou = self.mask_decoder(feats, image_pe, sparse)
        return masks[:, 0], iou[:, 0]

    def __call__(self, pixels, boxes):
        feats = self.encode_image(pixels)
        return self.decode_boxes(feats, boxes)
