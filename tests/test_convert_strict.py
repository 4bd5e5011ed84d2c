"""Strict converter-exactness tests for the three converters that cannot be
numerically validated offline (diffusers is not installed, real weights not
downloadable): SDXL UNet, SDXL VAE, and the I2VGen-XL UNet
(``fusion_sampling.py:119-123``, ``run_video.py:21-22``).

Strategy: run each converter on a synthetic torch-layout checkpoint built
at *full reference topology* (every block type, layer count, and
transformer depth of the real config — only channel widths shrunk so the
1-core host can hold it) and require the converted tree to be IDENTICAL to
``model.init``'s structure: no missing paths, no unexpected paths, exact
shapes and dtypes, with every source tensor consumed. This catches the
rename bugs that tiny/micro topologies can hide (deep transformer stacks,
the 4th video level, SDXL's plain Down/UpBlock tails).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tweediemix_tpu.models.convert import (
    convert_unet3d_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    validate_params_tree,
)


def _unet2d_torch_name(path, shape, rng):
    """flax path → diffusers UNet2DConditionModel name + torch-layout array
    (independent inverse of the converter, mirrored from the micro test)."""
    parts = []
    for seg in path[:-1]:
        seg = seg.replace("down_blocks_", "down_blocks.").replace("up_blocks_", "up_blocks.")
        seg = seg.replace("mid_block_", "mid_block.")
        seg = seg.replace("_resnets_", ".resnets.").replace("_attentions_", ".attentions.")
        seg = seg.replace("_downsamplers_", ".downsamplers.").replace("_upsamplers_", ".upsamplers.")
        seg = seg.replace("resnets_", "resnets.").replace("attentions_", "attentions.")
        seg = seg.replace("transformer_blocks_", "transformer_blocks.")
        seg = seg.replace("net_0_proj", "net.0.proj").replace("net_2", "net.2")
        seg = seg.replace("to_out_0", "to_out.0")
        parts.append(seg)
    leaf = path[-1]
    if leaf == "kernel":
        name = ".".join(parts) + ".weight"
        if len(shape) == 2:
            arr = rng.randn(shape[1], shape[0])
        else:  # conv [kh,kw,I,O] → [O,I,kh,kw]
            arr = rng.randn(shape[3], shape[2], shape[0], shape[1])
    elif leaf == "scale":
        name = ".".join(parts) + ".weight"
        arr = rng.randn(*shape)
    else:
        name = ".".join(parts) + f".{leaf}"
        arr = rng.randn(*shape)
    name = name.replace("ff.net_0_proj", "ff.net.0.proj").replace("ff.net_2", "ff.net.2")
    return name, arr.astype(np.float32)


def _assert_strict(got_tree, want, context):
    got = traverse_util.flatten_dict(got_tree)
    assert set(got) == set(want), (
        context, sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), (context, p)
        assert got[p].dtype == want[p].dtype, (context, p, got[p].dtype, want[p].dtype)
    # and the strict loader-side validation agrees
    validate_params_tree(got_tree, traverse_util.unflatten_dict(want), context)


def test_convert_unet_sdxl_topology_strict():
    """Full SDXL topology (3 levels, layers_per_block 2, transformer depths
    (1,2,10), plain DownBlock2D head / UpBlock2D tail) with shrunk widths."""
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.sdxl(
        block_out_channels=(16, 32, 64), num_attention_heads=(2, 4, 8),
        cross_attention_dim=32, norm_num_groups=8,
        addition_time_embed_dim=8, pooled_projection_dim=32,
    )
    model = UNet2DConditionModel(cfg)
    want = traverse_util.flatten_dict(
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 16, 16, 4), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((1, 16, cfg.cross_attention_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, cfg.pooled_projection_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, 6), jnp.float32),
        )["params"]
    )
    rng = np.random.RandomState(0)
    sd = {}
    for path, leafshape in want.items():
        name, arr = _unet2d_torch_name(path, leafshape.shape, rng)
        assert name not in sd, f"inverse mapping collision: {name}"
        sd[name] = arr
    got = convert_unet_state_dict(sd)
    _assert_strict(got, want, "sdxl_unet")


def test_convert_vae_sdxl_topology_strict():
    """Full SDXL VAE topology (4 levels, layers_per_block 2, mid attention,
    quant/post_quant convs) with shrunk widths; covers encoder+decoder."""
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.sdxl(block_out_channels=(16, 32, 64, 64), norm_num_groups=8)
    model = AutoencoderKL(cfg)
    want = traverse_util.flatten_dict(
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32),
            jax.random.PRNGKey(1),
        )["params"]
    )
    rng = np.random.RandomState(1)
    sd = {}
    for path, leafshape in want.items():
        shape = leafshape.shape
        # VAE flax paths already start with encoder/decoder/quant_conv...
        name, arr = _unet2d_torch_name(path, shape, rng)
        # VAE attention leaves: GroupNorm is "group_norm" on both sides;
        # 1-D "kernel"→"scale" handling is in _unet2d_torch_name already
        assert name not in sd, f"inverse mapping collision: {name}"
        sd[name] = arr
    got = convert_vae_state_dict(sd)
    _assert_strict(got, want, "sdxl_vae")


def test_convert_unet3d_i2v_topology_strict():
    """Full I2VGen-XL topology (4 levels incl. the plain DownBlock3D tail,
    layers_per_block 2, temporal convs/attn, image-latent context stacks)
    with shrunk widths."""
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig.i2vgen(
        block_out_channels=(16, 32, 64, 64), attention_head_dim=8,
        cross_attention_dim=32, norm_num_groups=8, context_pool_size=4,
    )
    model = UNet3DConditionModel(cfg)
    b, f, h, w = 1, 2, 16, 16
    args = (
        jax.ShapeDtypeStruct((b, f, h, w, 4), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((b, 6, cfg.cross_attention_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, f, h, w, 4), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, cfg.cross_attention_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    want = traverse_util.flatten_dict(
        jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)["params"]
    )

    rng = np.random.RandomState(2)
    top_inv = {
        "image_latents_proj_in_conv1": "image_latents_proj_in.0",
        "image_latents_proj_in_conv2": "image_latents_proj_in.2",
        "image_latents_proj_in_conv3": "image_latents_proj_in.4",
        "image_latents_context_embedding_conv1": "image_latents_context_embedding.0",
        "image_latents_context_embedding_conv2": "image_latents_context_embedding.3",
        "image_latents_context_embedding_conv3": "image_latents_context_embedding.5",
    }

    def inv_top(top):
        m = re.match(r"(down_blocks|up_blocks)_(\d+)_([a-z_]+)_(\d+)$", top)
        if m:
            return f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}"
        m = re.match(r"mid_block_([a-z_]+)_(\d+)$", top)
        if m:
            return f"mid_block.{m.group(1)}.{m.group(2)}"
        return top_inv.get(top, top)

    sd = {}
    for path, leafshape in want.items():
        shape = leafshape.shape
        mod, leaf = list(path[:-1]), path[-1]
        top = mod[0]
        mod[0] = inv_top(top)
        name = ".".join(mod)
        name = re.sub(r"transformer_blocks_(\d+)", r"transformer_blocks.\1", name)
        name = name.replace("net_0_proj", "net.0.proj").replace("net_2", "net.2")
        name = name.replace("to_out_0", "to_out.0")
        name = name.replace("context_embedding.linear_1", "context_embedding.0")
        name = name.replace("context_embedding.linear_2", "context_embedding.2")
        name = name.replace("fps_embedding.linear_1", "fps_embedding.0")
        name = name.replace("fps_embedding.linear_2", "fps_embedding.2")
        if "temp_convs" in name:
            name = re.sub(r"norm(\d)$", r"conv\1.0", name)
            name = re.sub(
                r"conv(\d)$",
                lambda mm: f"conv{mm.group(1)}." + ("2" if mm.group(1) == "1" else "3"),
                name,
            )
        spatial_attn = ("attentions" in top and "temp_attentions" not in top)
        if leaf == "kernel":
            tleaf = "weight"
            if len(shape) == 5:
                arr = rng.randn(shape[4], shape[3], shape[0], shape[1], shape[2])
            elif len(shape) == 4:
                arr = rng.randn(shape[3], shape[2], shape[0], shape[1])
            elif spatial_attn and path[-2] in ("proj_in", "proj_out"):
                arr = rng.randn(shape[1], shape[0], 1, 1)
            else:
                arr = rng.randn(shape[1], shape[0])
        elif leaf == "scale":
            tleaf = "weight"
            arr = rng.randn(*shape)
        else:
            tleaf = leaf
            arr = rng.randn(*shape)
        full = f"{name}.{tleaf}"
        assert full not in sd, f"inverse mapping collision: {full}"
        sd[full] = arr.astype(np.float32)

    got = convert_unet3d_state_dict(sd)
    _assert_strict(got, want, "i2v_unet")


def test_validate_params_tree_catches_drift():
    """The loader-side validator must flag missing, unexpected, and
    mis-shaped leaves (the 'unconsumed source tensor' guard)."""
    shapes = traverse_util.unflatten_dict({
        ("a", "kernel"): jax.ShapeDtypeStruct((2, 3), jnp.float32),
        ("b", "bias"): jax.ShapeDtypeStruct((3,), jnp.float32),
    })
    good = traverse_util.unflatten_dict({
        ("a", "kernel"): jnp.zeros((2, 3)),
        ("b", "bias"): jnp.zeros((3,)),
    })
    validate_params_tree(good, shapes)  # no raise

    bad = traverse_util.unflatten_dict({
        ("a", "kernel"): jnp.zeros((3, 2)),       # wrong shape
        ("c", "kernel"): jnp.zeros((1,)),          # unexpected (unconsumed)
    })
    with pytest.raises(ValueError) as ei:
        validate_params_tree(bad, shapes, "toy")
    msg = str(ei.value)
    assert "missing: b/bias" in msg
    assert "unexpected: c/kernel" in msg
    assert "shape mismatch: a/kernel" in msg


def test_load_path_validators_accept_correct_trees():
    """Every validate_*_params helper used on the real-weights CLI load
    paths must accept a correctly-shaped tree — including the REAL
    configs' structural constraints (the i2vgen probe must respect
    context_pool_size; regression for a probe-latent bug that aborted
    run_video --model_dir on valid checkpoints)."""
    import jax

    from tweediemix_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
    )
    from tweediemix_tpu.models.convert import (
        validate_clip_params,
        validate_clip_vision_params,
        validate_unet3d_params,
        validate_unet_params,
        validate_vae_params,
    )
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig

    def zeros_like_init(model, *args):
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)["params"]
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    tcfg = CLIPTextConfig.tiny()
    validate_clip_params(
        tcfg,
        zeros_like_init(CLIPTextModel(tcfg), jnp.zeros((1, 8), jnp.int32)),
    )

    vccfg = CLIPVisionConfig.tiny()
    validate_clip_vision_params(
        vccfg,
        zeros_like_init(
            CLIPVisionModel(vccfg),
            jnp.zeros((1, vccfg.image_size, vccfg.image_size, 3)),
        ),
    )

    ucfg = UNetConfig.micro()
    h = ucfg.sample_size
    validate_unet_params(
        ucfg,
        zeros_like_init(
            UNet2DConditionModel(ucfg),
            jnp.zeros((1, h, h, 4)), jnp.int32(1),
            jnp.zeros((1, 8, ucfg.cross_attention_dim)),
            jnp.zeros((1, ucfg.pooled_projection_dim)), jnp.zeros((1, 6)),
        ),
    )

    vcfg = VAEConfig.tiny()
    validate_vae_params(
        vcfg,
        zeros_like_init(
            AutoencoderKL(vcfg), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)
        ),
    )

    # the REAL i2vgen config via eval_shape only (no compute — cheap on CPU)
    u3cfg = UNet3DConfig.i2vgen()
    s = u3cfg.context_pool_size
    shapes = jax.eval_shape(
        UNet3DConditionModel(u3cfg).init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 2, s, s, 4), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((1, 6, u3cfg.cross_attention_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, 2, s, s, 4), jnp.float32),
        jax.ShapeDtypeStruct((1, 1, u3cfg.cross_attention_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )["params"]
    validate_unet3d_params(
        u3cfg, jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    )
