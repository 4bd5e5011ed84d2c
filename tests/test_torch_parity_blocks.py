"""Torch-mirror numerics parity for the UNet2D / UNet3D / VAE blocks.

diffusers is not installed here, so these tests hand-write minimal *torch*
replicas of the diffusers building blocks the reference loads
(``fusion_generation/fusion_sampling.py:119`` StableDiffusionXLPipeline's
UNet/VAE; ``video_gen/pipeline_i2vgen_xl.py:484`` I2VGenXLUNet), using
torch's own GroupNorm/LayerNorm/Conv/Linear/SiLU/GELU kernels and the
documented diffusers forward orderings. Their state dicts are keyed with
the exact diffusers checkpoint names and pushed through our converters
(``models/convert.py``), so a parity failure localizes to either a
converter rename/transpose bug or a framework-level numeric divergence
(GroupNorm eps, conv padding, softmax dtype, GEGLU split order) — exactly
the class of bug the shape-roundtrip tests cannot see.

Covered block types (VERDICT round-4 item 2 asked for >= 6):
  unet2d: timestep embedding (+MLP), ResnetBlock2D, Transformer2DModel
          (BasicTransformerBlock/Attention/GEGLU), Downsample2D,
          Upsample2D, and the FULL tiny UNet2DConditionModel
  vae:    VAEResnetBlock, mid-block single-head attention, asymmetric-pad
          downsample, and the FULL tiny AutoencoderKL encode+decode
  unet3d: TemporalConvLayer, TransformerTemporalModel (double self-attn
          blocks), I2VGenXLTransformerTemporalEncoder
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

ATOL = 3e-5


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(y_jax):
    return np.asarray(y_jax).transpose(0, 3, 1, 2)


def _assert_close(torch_out, jax_out_nchw, atol=ATOL, label=""):
    a = torch_out.detach().numpy()
    b = np.asarray(jax_out_nchw)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4, err_msg=label)


# ---------------------------------------------------------------------------
# torch replicas of the diffusers blocks (checkpoint-identical state dicts)
# ---------------------------------------------------------------------------


def torch_timestep_embedding(t, dim, flip_sin_to_cos=True, shift=0.0):
    """diffusers ``get_timestep_embedding`` (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    freqs = torch.exp(exponent)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TorchTimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(self.act(self.linear_1(x)))


class TorchResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D, time_embedding_norm='default', scale 1."""

    def __init__(self, in_ch, out_ch, temb_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.nonlinearity = nn.SiLU()
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.nonlinearity(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
        h = self.nonlinearity(self.norm2(h))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchAttention(nn.Module):
    """diffusers Attention: unbiased q/k/v, biased out, fp32 softmax."""

    def __init__(self, query_dim, heads, dim_head, cross_dim=None, qkv_bias=False):
        super().__init__()
        inner = heads * dim_head
        ctx = cross_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(ctx, inner, bias=qkv_bias)
        self.to_v = nn.Linear(ctx, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape
        h, dh = self.heads, self.dim_head

        def heads(t):
            return t.reshape(b, -1, h, dh).permute(0, 2, 1, 3)

        q, k, v = heads(self.to_q(x)), heads(self.to_k(ctx)), heads(self.to_v(ctx))
        scores = q @ k.transpose(-1, -2) * dh**-0.5
        p = scores.float().softmax(dim=-1).to(v.dtype)
        out = (p @ v).permute(0, 2, 1, 3).reshape(b, s, h * dh)
        return self.to_out[0](out)


class TorchGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * nn.functional.gelu(gate)


class TorchFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='geglu'): net.0=GEGLU, net.2=Linear."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [TorchGEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TorchGELUFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='gelu'): net.0 = Linear+GELU."""

    class _GELU(nn.Module):
        def __init__(self, dim, inner):
            super().__init__()
            self.proj = nn.Linear(dim, inner)

        def forward(self, x):
            return nn.functional.gelu(self.proj(x))

    def __init__(self, dim, inner):
        super().__init__()
        self.net = nn.ModuleList(
            [self._GELU(dim, inner), nn.Identity(), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TorchBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim, double_self=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchAttention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TorchAttention(
            dim, heads, dim_head, cross_dim=None if double_self else cross_dim
        )
        self.double_self = double_self
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, ctx=None):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), None if self.double_self else ctx)
        return x + self.ff(self.norm3(x))


class TorchTransformer2DModel(nn.Module):
    """use_linear_projection=True spatial transformer (SDXL)."""

    def __init__(self, ch, heads, dim_head, layers, cross_dim, groups):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, inner)
        self.transformer_blocks = nn.ModuleList(
            [
                TorchBasicTransformerBlock(inner, heads, dim_head, cross_dim)
                for _ in range(layers)
            ]
        )
        self.proj_out = nn.Linear(inner, ch)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        x = self.proj_out(x)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class TorchDownsample2D(nn.Module):
    def __init__(self, ch, asymmetric=False):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:  # VAE encoder: F.pad (0,1,0,1)
            x = nn.functional.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TorchUpsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(nn.functional.interpolate(x, scale_factor=2.0, mode="nearest"))


# -------------------------- full tiny UNet2D mirror ------------------------


class TorchTinyUNet2D(nn.Module):
    """Mirror of UNetConfig.tiny(): blocks (32, 64), down=(DownBlock2D,
    CrossAttnDownBlock2D), up=(CrossAttnUpBlock2D, UpBlock2D),
    layers_per_block=1, transformer layers (1, 2), heads (2, 4), ctx 32,
    groups 8, addition_time_embed_dim 8, pooled 32 — the SDXL topology at
    test scale (module names match the diffusers checkpoint layout)."""

    def __init__(self):
        super().__init__()
        bo = (32, 64)
        tl = (1, 2)
        heads = (2, 4)
        groups, ctx_dim, atd, pooled = 8, 32, 8, 32
        ted = bo[0] * 4
        self.atd = atd
        self.bo = bo
        self.time_embedding = TorchTimestepEmbedding(bo[0], ted)
        self.add_embedding = TorchTimestepEmbedding(pooled + 6 * atd, ted)
        self.conv_in = nn.Conv2d(4, bo[0], 3, padding=1)

        def T(level):
            return TorchTransformer2DModel(
                bo[level], heads[level], bo[level] // heads[level],
                tl[level], ctx_dim, groups,
            )

        # down level 0: DownBlock2D (1 resnet) + downsampler
        self.down_res = nn.ModuleList(
            [TorchResnetBlock2D(bo[0], bo[0], ted, groups),
             TorchResnetBlock2D(bo[0], bo[1], ted, groups)]
        )
        self.down_attn = nn.ModuleList([T(1)])
        self.downsampler = nn.Conv2d(bo[0], bo[0], 3, stride=2, padding=1)
        # mid at level 1
        self.mid_res = nn.ModuleList(
            [TorchResnetBlock2D(bo[1], bo[1], ted, groups),
             TorchResnetBlock2D(bo[1], bo[1], ted, groups)]
        )
        self.mid_attn = T(1)
        # up block 0: CrossAttnUpBlock2D at level 1 (2 resnets + attns + upsample)
        self.up0_res = nn.ModuleList(
            [TorchResnetBlock2D(bo[1] + bo[1], bo[1], ted, groups),
             TorchResnetBlock2D(bo[1] + bo[0], bo[1], ted, groups)]
        )
        self.up0_attn = nn.ModuleList([T(1), T(1)])
        self.upsampler = nn.Conv2d(bo[1], bo[1], 3, padding=1)
        # up block 1: UpBlock2D at level 0
        self.up1_res = nn.ModuleList(
            [TorchResnetBlock2D(bo[1] + bo[0], bo[0], ted, groups),
             TorchResnetBlock2D(bo[0] + bo[0], bo[0], ted, groups)]
        )
        self.conv_norm_out = nn.GroupNorm(groups, bo[0], eps=1e-5)
        self.conv_out = nn.Conv2d(bo[0], 4, 3, padding=1)

    def state_dict_diffusers(self):
        """state dict with diffusers checkpoint names."""
        ren = {
            "down_res.0": "down_blocks.0.resnets.0",
            "down_res.1": "down_blocks.1.resnets.0",
            "down_attn.0": "down_blocks.1.attentions.0",
            "downsampler": "down_blocks.0.downsamplers.0.conv",
            "mid_res.0": "mid_block.resnets.0",
            "mid_res.1": "mid_block.resnets.1",
            "mid_attn": "mid_block.attentions.0",
            "up0_res.0": "up_blocks.0.resnets.0",
            "up0_res.1": "up_blocks.0.resnets.1",
            "up0_attn.0": "up_blocks.0.attentions.0",
            "up0_attn.1": "up_blocks.0.attentions.1",
            "upsampler": "up_blocks.0.upsamplers.0.conv",
            "up1_res.0": "up_blocks.1.resnets.0",
            "up1_res.1": "up_blocks.1.resnets.1",
        }
        out = {}
        for k, v in self.state_dict().items():
            for ours, theirs in ren.items():
                if k.startswith(ours + "."):
                    k = theirs + k[len(ours):]
                    break
            out[k] = v.detach().numpy()
        return out

    def forward(self, sample, t, ctx, pooled, time_ids):
        b = sample.shape[0]
        temb = self.time_embedding(
            torch_timestep_embedding(t.expand(b), self.bo[0]))
        ids_emb = torch_timestep_embedding(time_ids.reshape(-1), self.atd)
        ids_emb = ids_emb.reshape(b, -1)
        temb = temb + self.add_embedding(torch.cat([pooled, ids_emb], dim=-1))

        x = self.conv_in(sample)
        stack = [x]
        x = self.down_res[0](x, temb)
        stack.append(x)
        x = self.downsampler(x)
        stack.append(x)
        x = self.down_res[1](x, temb)
        x = self.down_attn[0](x, ctx)
        stack.append(x)

        x = self.mid_res[0](x, temb)
        x = self.mid_attn(x, ctx)
        x = self.mid_res[1](x, temb)

        for j in range(2):
            x = torch.cat([x, stack.pop()], dim=1)
            x = self.up0_res[j](x, temb)
            x = self.up0_attn[j](x, ctx)
        x = self.upsampler(nn.functional.interpolate(x, scale_factor=2.0, mode="nearest"))
        for j in range(2):
            x = torch.cat([x, stack.pop()], dim=1)
            x = self.up1_res[j](x, temb)

        x = nn.functional.silu(self.conv_norm_out(x))
        return self.conv_out(x)


# ----------------------------- full tiny VAE mirror ------------------------


class TorchVAEAttention(nn.Module):
    """VAE mid-block attention: single head, biased q/k/v, GN eps 1e-6."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        s = (q @ k.transpose(-1, -2)).float() * c**-0.5
        p = s.softmax(dim=-1).to(v.dtype)
        out = self.to_out[0](p @ v)
        return out.transpose(1, 2).reshape(b, c, h, w) + res


class TorchVAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(nn.functional.silu(self.norm1(x)))
        h = self.conv2(nn.functional.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchTinyVAE(nn.Module):
    """Mirror of VAEConfig.tiny(): blocks (16, 32), layers_per_block=1,
    groups 8; encoder + decoder + quant convs (diffusers AutoencoderKL)."""

    def __init__(self):
        super().__init__()
        bo, groups, lc = (16, 32), 8, 4

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv2d(3, bo[0], 3, padding=1)
                self.res = nn.ModuleList(
                    [TorchVAEResnet(bo[0], bo[0], groups),
                     TorchVAEResnet(bo[0], bo[1], groups)]
                )
                self.down = TorchDownsample2D(bo[0], asymmetric=True)
                self.mid = nn.ModuleList(
                    [TorchVAEResnet(bo[1], bo[1], groups),
                     TorchVAEResnet(bo[1], bo[1], groups)]
                )
                self.mid_attn = TorchVAEAttention(bo[1], groups)
                self.conv_norm_out = nn.GroupNorm(groups, bo[1], eps=1e-6)
                self.conv_out = nn.Conv2d(bo[1], 2 * lc, 3, padding=1)

            def forward(self, x):
                x = self.conv_in(x)
                x = self.res[0](x)
                x = self.down(x)
                x = self.res[1](x)
                x = self.mid[0](x)
                x = self.mid_attn(x)
                x = self.mid[1](x)
                return self.conv_out(nn.functional.silu(self.conv_norm_out(x)))

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv2d(lc, bo[1], 3, padding=1)
                self.mid = nn.ModuleList(
                    [TorchVAEResnet(bo[1], bo[1], groups),
                     TorchVAEResnet(bo[1], bo[1], groups)]
                )
                self.mid_attn = TorchVAEAttention(bo[1], groups)
                self.res = nn.ModuleList(
                    [TorchVAEResnet(bo[1], bo[1], groups),
                     TorchVAEResnet(bo[1], bo[1], groups),
                     TorchVAEResnet(bo[1], bo[0], groups),
                     TorchVAEResnet(bo[0], bo[0], groups)]
                )
                self.up = TorchUpsample2D(bo[1])
                self.conv_norm_out = nn.GroupNorm(groups, bo[0], eps=1e-6)
                self.conv_out = nn.Conv2d(bo[0], 3, 3, padding=1)

            def forward(self, z):
                x = self.conv_in(z)
                x = self.mid[0](x)
                x = self.mid_attn(x)
                x = self.mid[1](x)
                x = self.res[0](x)
                x = self.res[1](x)
                x = self.up(x)
                x = self.res[2](x)
                x = self.res[3](x)
                return self.conv_out(nn.functional.silu(self.conv_norm_out(x)))

        self.encoder = Enc()
        self.decoder = Dec()
        self.quant_conv = nn.Conv2d(2 * lc, 2 * lc, 1)
        self.post_quant_conv = nn.Conv2d(lc, lc, 1)

    def state_dict_diffusers(self):
        ren = {
            "encoder.res.0": "encoder.down_blocks.0.resnets.0",
            "encoder.res.1": "encoder.down_blocks.1.resnets.0",
            "encoder.down": "encoder.down_blocks.0.downsamplers.0",
            "encoder.mid_attn": "encoder.mid_block.attentions.0",
            "encoder.mid.0": "encoder.mid_block.resnets.0",
            "encoder.mid.1": "encoder.mid_block.resnets.1",
            "decoder.mid_attn": "decoder.mid_block.attentions.0",
            "decoder.mid.0": "decoder.mid_block.resnets.0",
            "decoder.mid.1": "decoder.mid_block.resnets.1",
            "decoder.res.0": "decoder.up_blocks.0.resnets.0",
            "decoder.res.1": "decoder.up_blocks.0.resnets.1",
            "decoder.up": "decoder.up_blocks.0.upsamplers.0",
            "decoder.res.2": "decoder.up_blocks.1.resnets.0",
            "decoder.res.3": "decoder.up_blocks.1.resnets.1",
        }
        out = {}
        for k, v in self.state_dict().items():
            for ours, theirs in sorted(ren.items(), key=lambda kv: -len(kv[0])):
                if k.startswith(ours + "."):
                    k = theirs + k[len(ours):]
                    break
            out[k] = v.detach().numpy()
        return out


# -------------------------- unet3d torch mirrors ---------------------------


class TorchTemporalConvLayer(nn.Module):
    """diffusers TemporalConvLayer: 4x (GN -> SiLU [-> Dropout] -> Conv3d
    (3,1,1)), final conv zero-init, one residual."""

    def __init__(self, ch, groups):
        super().__init__()

        def stage(first):
            mods = [nn.GroupNorm(groups, ch), nn.SiLU()]
            if not first:
                mods.append(nn.Dropout(0.0))
            mods.append(nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0)))
            return nn.Sequential(*mods)

        self.conv1 = stage(True)
        self.conv2 = stage(False)
        self.conv3 = stage(False)
        self.conv4 = stage(False)
        nn.init.zeros_(self.conv4[-1].weight)
        nn.init.zeros_(self.conv4[-1].bias)

    def forward(self, x):  # [B, C, F, H, W]
        identity = x
        x = self.conv4(self.conv3(self.conv2(self.conv1(x))))
        return identity + x


class TorchTransformerTemporal(nn.Module):
    """diffusers TransformerTemporalModel: GN -> linear in -> double-self
    blocks over the frame axis -> linear out -> residual."""

    def __init__(self, ch, heads, dim_head, groups):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, inner)
        self.transformer_blocks = nn.ModuleList(
            [TorchBasicTransformerBlock(inner, heads, dim_head, None, double_self=True)]
        )
        self.proj_out = nn.Linear(inner, ch)

    def forward(self, x, num_frames):  # x: [B*F, C, H, W]
        bf, c, h, w = x.shape
        b = bf // num_frames
        res = x
        y = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        y = self.norm(y)
        y = y.permute(0, 3, 4, 2, 1).reshape(b * h * w, num_frames, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y)
        y = self.proj_out(y)
        y = y.reshape(b, h, w, num_frames, c).permute(0, 3, 4, 1, 2)
        return y.reshape(bf, c, h, w) + res


class TorchImageLatentsTemporalEncoder(nn.Module):
    """I2VGenXLTransformerTemporalEncoder: norm1 -> attn1 (+res) ->
    gelu-FF with NO pre-FF norm (+res)."""

    def __init__(self, dim, heads, dim_head, ff_inner):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchAttention(dim, heads, dim_head)
        self.ff = TorchGELUFeedForward(dim, ff_inner)

    def forward(self, x):
        x = x + self.attn1(self.norm1(x))
        return x + self.ff(x)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_timestep_embedding_and_mlp_match_torch():
    from tweediemix_tpu.models.convert import convert_unet_state_dict
    from tweediemix_tpu.models.embeddings import (
        TimestepEmbedding,
        timestep_embedding,
    )

    t = torch.tensor([0.0, 1.0, 17.0, 999.0])
    for dim in (32, 8):
        ref = torch_timestep_embedding(t, dim)
        ours = timestep_embedding(jnp.asarray(t.numpy()), dim)
        np.testing.assert_allclose(ref.numpy(), np.asarray(ours), atol=1e-5)

    torch.manual_seed(0)
    mlp = TorchTimestepEmbedding(32, 128).eval()
    sd = {f"time_embedding.{k}": v.detach().numpy()
          for k, v in mlp.state_dict().items()}
    params = convert_unet_state_dict(sd)["time_embedding"]
    x = torch.randn(3, 32)
    with torch.no_grad():
        ref = mlp(x)
    got = TimestepEmbedding(128).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(ref.numpy(), np.asarray(got), atol=1e-5, rtol=1e-4)


def test_resnet_block2d_matches_torch():
    from tweediemix_tpu.models.convert import convert_unet_state_dict
    from tweediemix_tpu.models.unet2d import ResnetBlock2D

    torch.manual_seed(1)
    for in_ch, out_ch in ((32, 32), (32, 64)):
        blk = TorchResnetBlock2D(in_ch, out_ch, 24, groups=8).eval()
        sd = {f"down_blocks.0.resnets.0.{k}": v.detach().numpy()
              for k, v in blk.state_dict().items()}
        params = convert_unet_state_dict(sd)["down_blocks_0_resnets_0"]
        x = torch.randn(2, in_ch, 8, 8)
        temb = torch.randn(2, 24)
        with torch.no_grad():
            ref = blk(x, temb)
        got = ResnetBlock2D(out_ch, 8).apply(
            {"params": params}, _nhwc(x), jnp.asarray(temb.numpy()))
        _assert_close(ref, _from_nhwc(got), label=f"resnet {in_ch}->{out_ch}")


def test_transformer2d_matches_torch():
    """Covers BasicTransformerBlock, Attention (self + cross), GEGLU FF,
    the GN(1e-6) + linear proj_in/out sandwich, and the converter renames."""
    from tweediemix_tpu.models.convert import convert_unet_state_dict
    from tweediemix_tpu.models.unet2d import Transformer2DModel

    torch.manual_seed(2)
    blk = TorchTransformer2DModel(
        ch=32, heads=2, dim_head=16, layers=2, cross_dim=48, groups=8).eval()
    sd = {f"mid_block.attentions.0.{k}": v.detach().numpy()
          for k, v in blk.state_dict().items()}
    params = convert_unet_state_dict(sd)["mid_block_attentions_0"]
    x = torch.randn(2, 32, 8, 8)
    ctx = torch.randn(2, 11, 48)
    with torch.no_grad():
        ref = blk(x, ctx)
    got = Transformer2DModel(
        heads=2, dim_head=16, num_layers=2, cross_attention_dim=48,
        norm_num_groups=8,
    ).apply({"params": params}, _nhwc(x), jnp.asarray(ctx.numpy()), None)
    _assert_close(ref, _from_nhwc(got), label="transformer2d")


def test_down_up_sample_match_torch():
    from tweediemix_tpu.models.convert import convert_unet_state_dict
    from tweediemix_tpu.models.unet2d import Downsample2D, Upsample2D

    torch.manual_seed(3)
    down = TorchDownsample2D(16).eval()
    up = TorchUpsample2D(16).eval()
    x = torch.randn(2, 16, 8, 8)
    sd = {f"down_blocks.0.downsamplers.0.{k}": v.detach().numpy()
          for k, v in down.state_dict().items()}
    dparams = convert_unet_state_dict(sd)["down_blocks_0_downsamplers_0"]
    sd = {f"up_blocks.0.upsamplers.0.{k}": v.detach().numpy()
          for k, v in up.state_dict().items()}
    uparams = convert_unet_state_dict(sd)["up_blocks_0_upsamplers_0"]
    with torch.no_grad():
        dref, uref = down(x), up(x)
    dgot = Downsample2D(16).apply({"params": dparams}, _nhwc(x))
    ugot = Upsample2D(16).apply({"params": uparams}, _nhwc(x))
    _assert_close(dref, _from_nhwc(dgot), label="downsample")
    _assert_close(uref, _from_nhwc(ugot), label="upsample")


def test_unet2d_full_tiny_matches_torch():
    """The full SDXL-topology forward at tiny scale: timestep + add_time_ids
    conditioning, down/mid/up with skip concatenation order, output head —
    against genuine torch kernels through convert_unet_state_dict
    (the offline proxy for loading fusion_sampling.py:119's checkpoint)."""
    from tweediemix_tpu.models.convert import (
        convert_unet_state_dict,
        validate_unet_params,
    )
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    torch.manual_seed(4)
    net = TorchTinyUNet2D().eval()
    params = convert_unet_state_dict(net.state_dict_diffusers())
    cfg = UNetConfig.tiny()
    validate_unet_params(cfg, params)

    sample = torch.randn(2, 4, 8, 8)
    t = torch.tensor(37.0)
    ctx = torch.randn(2, 11, 32)
    pooled = torch.randn(2, 32)
    time_ids = torch.tensor([[64.0, 64.0, 0.0, 0.0, 64.0, 64.0]]).repeat(2, 1)
    with torch.no_grad():
        ref = net(sample, t, ctx, pooled, time_ids)
    got = UNet2DConditionModel(cfg).apply(
        {"params": params}, _nhwc(sample), jnp.float32(37.0),
        jnp.asarray(ctx.numpy()), jnp.asarray(pooled.numpy()),
        jnp.asarray(time_ids.numpy()),
    )
    _assert_close(ref, _from_nhwc(got), atol=1e-4, label="full tiny unet2d")


def test_vae_full_tiny_matches_torch():
    """Encoder (asymmetric-pad downsample, mid attention) + decoder
    (nearest upsample) + quant convs against genuine torch kernels through
    convert_vae_state_dict (proxy for fusion_sampling.py:123's VAE)."""
    from tweediemix_tpu.models.convert import (
        convert_vae_state_dict,
        validate_vae_params,
    )
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(5)
    net = TorchTinyVAE().eval()
    params = convert_vae_state_dict(net.state_dict_diffusers())
    cfg = VAEConfig.tiny()
    validate_vae_params(cfg, params)
    vae = AutoencoderKL(cfg)

    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        moments = net.quant_conv(net.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        dec = net.decoder(net.post_quant_conv(mean))
    got_mean, got_logvar = vae.apply({"params": params}, _nhwc(x), method=vae.encode)
    _assert_close(mean, _from_nhwc(got_mean), atol=1e-4, label="vae encode mean")
    _assert_close(
        logvar.clamp(-30, 20), _from_nhwc(got_logvar), atol=1e-4, label="vae logvar")
    got_dec = vae.apply({"params": params}, got_mean, method=vae.decode)
    _assert_close(dec, _from_nhwc(got_dec), atol=1e-4, label="vae decode")


def _convert_3d(prefix, torch_module):
    from tweediemix_tpu.models.convert import convert_unet3d_state_dict

    sd = {f"{prefix}.{k}": v.detach().numpy()
          for k, v in torch_module.state_dict().items()}
    return convert_unet3d_state_dict(sd)


def test_temporal_conv_layer_matches_torch():
    from tweediemix_tpu.models.unet3d import TemporalConvLayer

    torch.manual_seed(6)
    blk = TorchTemporalConvLayer(16, groups=8).eval()
    # the zero-init'd conv4 makes the layer identity; randomize to test math
    nn.init.normal_(blk.conv4[-1].weight, std=0.1)
    nn.init.normal_(blk.conv4[-1].bias, std=0.1)
    params = _convert_3d("down_blocks.0.temp_convs.0", blk)[
        "down_blocks_0_temp_convs_0"]
    x = torch.randn(2, 16, 5, 4, 4)  # [B, C, F, H, W]
    with torch.no_grad():
        ref = blk(x)
    # ours: [B, F, H, W, C]
    got = TemporalConvLayer(16, 8).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        ref.numpy(), np.asarray(got).transpose(0, 4, 1, 2, 3),
        atol=ATOL, rtol=1e-4)


def test_transformer_temporal_matches_torch():
    from tweediemix_tpu.models.unet3d import TransformerTemporalModel

    torch.manual_seed(7)
    blk = TorchTransformerTemporal(16, heads=2, dim_head=8, groups=8).eval()
    params = _convert_3d("transformer_in", blk)["transformer_in"]
    b, f = 2, 5
    x = torch.randn(b * f, 16, 4, 4)  # [B*F, C, H, W]
    with torch.no_grad():
        ref = blk(x, num_frames=f)
    x5 = x.reshape(b, f, 16, 4, 4).numpy().transpose(0, 1, 3, 4, 2)  # B,F,H,W,C
    got = TransformerTemporalModel(
        in_channels=16, heads=2, dim_head=8, num_layers=1, norm_num_groups=8,
    ).apply({"params": params}, jnp.asarray(x5))
    got_bf = np.asarray(got).transpose(0, 1, 4, 2, 3).reshape(b * f, 16, 4, 4)
    np.testing.assert_allclose(ref.numpy(), got_bf, atol=ATOL, rtol=1e-4)


def test_image_latents_temporal_encoder_matches_torch():
    from tweediemix_tpu.models.unet3d import ImageLatentsTemporalEncoder

    torch.manual_seed(8)
    blk = TorchImageLatentsTemporalEncoder(4, heads=2, dim_head=4, ff_inner=16).eval()
    params = _convert_3d("image_latents_temporal_encoder", blk)[
        "image_latents_temporal_encoder"]
    x = torch.randn(6, 5, 4)  # [N, F, C]
    with torch.no_grad():
        ref = blk(x)
    got = ImageLatentsTemporalEncoder(
        dim=4, heads=2, dim_head=4, ff_inner_dim=16,
    ).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(ref.numpy(), np.asarray(got), atol=ATOL, rtol=1e-4)
