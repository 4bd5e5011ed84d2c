"""HF/diffusers torch checkpoints → flax param pytrees.

The reference loads weights from the HF hub at runtime
(``fusion_generation/fusion_sampling.py:119-123,203-210``); in the TPU
rebuild, weights come from a *local* HF-layout checkpoint directory and are
converted once into our NHWC/flax layouts:

* linear ``weight [out, in]`` → ``kernel [in, out]``;
* conv ``weight [O, I, kh, kw]`` → ``kernel [kh, kw, I, O]``;
* 1-D norm ``weight``/``bias`` → ``scale``/``bias``;
* embeddings are copied untransposed.

The name mapping reuses ``concepts.delta.torch_name_to_flax_path`` for UNet
block renames and adds model-specific rules (ff.net, CLIP towers, VAE
samplers).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from tweediemix_tpu.concepts.delta import torch_name_to_flax_path


def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors (preferred) or *.bin in a checkpoint dir."""
    sd: Dict[str, np.ndarray] = {}
    files = sorted(os.listdir(model_dir))
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if f.endswith(".bin")]
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(model_dir, f), framework="np") as reader:
                for k in reader.keys():
                    sd[k] = reader.get_tensor(k)
    elif bin_files:
        import torch

        for f in bin_files:
            st = torch.load(os.path.join(model_dir, f), map_location="cpu", weights_only=True)
            for k, v in st.items():
                sd[k] = v.float().numpy()
    else:
        raise FileNotFoundError(f"no .safetensors or .bin files in {model_dir}")
    return {k: np.asarray(v) for k, v in sd.items()}


def _convert_leaf(path: Tuple[str, ...], arr: np.ndarray) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Apply layout rules; path arrives with 'kernel' for torch 'weight'."""
    if path[-1] == "kernel":
        if arr.ndim == 1:  # norm weight
            return path[:-1] + ("scale",), arr
        if arr.ndim == 2:
            return path, arr.T
        if arr.ndim == 4:
            return path, arr.transpose(2, 3, 1, 0)
    return path, arr


def convert_unet_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    out = {}
    for name, arr in sd.items():
        name = name.replace("ff.net.0.proj", "ff.net_0_proj").replace("ff.net.2", "ff.net_2")
        path = torch_name_to_flax_path(name)
        path, arr = _convert_leaf(path, arr)
        if dtype is not None and arr.dtype in (np.float32, np.float16):
            arr = arr.astype(dtype)
        out[path] = jnp.asarray(arr)
    return traverse_util.unflatten_dict(out)


def convert_vae_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    return convert_unet_state_dict(sd, dtype=dtype)  # same rename rules apply


_CLIP_LAYER = re.compile(r"text_model\.encoder\.layers\.(\d+)\.")


def convert_clip_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """HF CLIPTextModel(WithProjection) → our CLIPTextModel params."""
    out = {}
    for name, arr in sd.items():
        if name.startswith("text_model.embeddings.token_embedding"):
            out[("token_embedding", "embedding")] = arr
            continue
        if name.startswith("text_model.embeddings.position_embedding"):
            out[("position_embedding",)] = arr
            continue
        if name == "text_projection.weight":
            out[("text_projection", "kernel")] = arr.T
            continue
        if name.startswith("text_model.final_layer_norm"):
            leaf = "scale" if name.endswith("weight") else "bias"
            out[("final_layer_norm", leaf)] = arr
            continue
        m = _CLIP_LAYER.match(name)
        if m:
            rest = name[m.end():]
            layer = f"layers_{m.group(1)}"
            rest = rest.replace("self_attn.", "").replace("mlp.", "")
            parts = rest.split(".")
            leaf = parts[-1]
            mod = parts[0]
            if leaf == "weight":
                leaf = "scale" if arr.ndim == 1 else "kernel"
                if arr.ndim == 2:
                    arr = arr.T
            out[(layer, mod, leaf)] = arr
            continue
        # position_ids buffers etc. are dropped
    if dtype is not None:
        out = {k: (v.astype(dtype) if v.dtype in (np.float32, np.float16) else v) for k, v in out.items()}
    return traverse_util.unflatten_dict({k: jnp.asarray(v) for k, v in out.items()})


def validate_params_tree(params, shapes_tree, name: str = "model") -> None:
    """Strict structural check of a converted param tree against
    ``jax.eval_shape(model.init, ...)["params"]``: no missing paths, no
    unexpected paths (an unconsumed/bogus source tensor would land here),
    and exact per-leaf shapes. Raises ValueError listing every problem.

    Used on the real-weights load paths — the strongest offline guard for
    the converters that cannot be numerically validated in this
    environment (SDXL UNet / VAE / I2V UNet: diffusers is not installed
    and real weights are not downloadable)."""
    got = traverse_util.flatten_dict(params)
    want = traverse_util.flatten_dict(shapes_tree)
    problems = []
    for p in sorted(set(want) - set(got)):
        problems.append(f"missing: {'/'.join(p)} {tuple(want[p].shape)}")
    for p in sorted(set(got) - set(want)):
        problems.append(f"unexpected: {'/'.join(p)} {tuple(np.shape(got[p]))}")
    for p in sorted(set(got) & set(want)):
        if tuple(np.shape(got[p])) != tuple(want[p].shape):
            problems.append(
                f"shape mismatch: {'/'.join(p)} got {tuple(np.shape(got[p]))} "
                f"want {tuple(want[p].shape)}")
    if problems:
        head = "\n  ".join(problems[:20])
        more = f"\n  ... and {len(problems) - 20} more" if len(problems) > 20 else ""
        raise ValueError(
            f"converted {name} params do not match the model structure "
            f"({len(problems)} problems):\n  {head}{more}")


def _S(shape, dtype=None):
    return jax.ShapeDtypeStruct(shape, dtype or jnp.float32)


def validate_unet_params(cfg, params) -> None:
    """Strict check of converted SDXL UNet params against ``cfg``'s init
    structure (real-weights load guard)."""
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel

    model = UNet2DConditionModel(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        _S((1, 16, 16, cfg.in_channels)), _S((), jnp.int32),
        _S((1, 16, cfg.cross_attention_dim)),
        _S((1, cfg.pooled_projection_dim)), _S((1, 6)),
    )["params"]
    validate_params_tree(params, shapes, "sdxl_unet")


def validate_vae_params(cfg, params) -> None:
    from tweediemix_tpu.models.vae import AutoencoderKL

    model = AutoencoderKL(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        _S((1, 32, 32, cfg.in_channels)), jax.random.PRNGKey(1),
    )["params"]
    validate_params_tree(params, shapes, "vae")


def validate_clip_params(cfg, params) -> None:
    from tweediemix_tpu.models.clip import CLIPTextModel

    shapes = jax.eval_shape(
        CLIPTextModel(cfg).init, jax.random.PRNGKey(0), _S((1, 8), jnp.int32)
    )["params"]
    validate_params_tree(params, shapes, "clip_text")


def validate_clip_vision_params(cfg, params) -> None:
    from tweediemix_tpu.models.clip import CLIPVisionModel

    shapes = jax.eval_shape(
        CLIPVisionModel(cfg).init, jax.random.PRNGKey(0),
        _S((1, cfg.image_size, cfg.image_size, 3)),
    )["params"]
    validate_params_tree(params, shapes, "clip_vision")


def validate_unet3d_params(cfg, params) -> None:
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel

    model = UNet3DConditionModel(cfg)
    # probe latents must satisfy the model's own H/W >= context_pool_size
    # assertion (32 for the real i2vgen config); params are spatial-size
    # independent so any legal size validates the same tree
    s = max(16, cfg.context_pool_size)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        _S((1, 2, s, s, cfg.in_channels)), _S((), jnp.int32),
        _S((1, 6, cfg.cross_attention_dim)), _S((1, 2, s, s, cfg.in_channels)),
        _S((1, 1, cfg.cross_attention_dim)), _S(()),
    )["params"]
    validate_params_tree(params, shapes, "i2v_unet")


def clip_params_to_hf_state_dict(params) -> Dict[str, np.ndarray]:
    """Our CLIPTextModel params → HF CLIPTextModel(WithProjection) torch
    naming/layout — the exact inverse of ``convert_clip_state_dict``.

    Used to write the ``delta_dict['text_encoder']`` entry of
    ``--train_text_encoder`` checkpoints in the reference's schema
    (``diffusers_training_xl_new.py:52-53``;
    ``diffusers_model_pipeline_xl_new.py:327-328`` loads it with
    ``load_state_dict``)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, arr in flat.items():
        arr = np.asarray(arr, np.float32)
        if path == ("token_embedding", "embedding"):
            out["text_model.embeddings.token_embedding.weight"] = arr
        elif path == ("position_embedding",):
            out["text_model.embeddings.position_embedding.weight"] = arr
        elif path == ("text_projection", "kernel"):
            out["text_projection.weight"] = arr.T
        elif path[0] == "final_layer_norm":
            leaf = "weight" if path[1] == "scale" else "bias"
            out[f"text_model.final_layer_norm.{leaf}"] = arr
        elif path[0].startswith("layers_"):
            idx = path[0][len("layers_"):]
            mod, leaf = path[1], path[2]
            group = "self_attn." if mod.endswith("_proj") else ("mlp." if mod in ("fc1", "fc2") else "")
            if mod.startswith("layer_norm"):
                group = ""
            if leaf == "kernel":
                leaf, arr = "weight", arr.T
            elif leaf == "scale":
                leaf = "weight"
            out[f"text_model.encoder.layers.{idx}.{group}{mod}.{leaf}"] = arr
        else:
            raise KeyError(f"unmapped CLIP param path {path}")
    return out


_SAM_BLOCK = re.compile(r"image_encoder\.blocks\.(\d+)\.")
_SAM_DEC_LAYER = re.compile(r"mask_decoder\.transformer\.layers\.(\d+)\.")


def convert_sam_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """segment-anything checkpoint → our Flax SAM params.

    Covers the box-prompt path (image encoder, pe layer + box corner
    embeddings, ``no_mask_embed`` dense constant, two-way mask decoder).
    Point/mask-prompt embeddings of the upstream prompt encoder
    (``not_a_point_embed``, ``mask_downscaling``) are dropped — the
    reference only uses box prompts
    (``text_segment/lang_sam/lang_sam.py:121-131``)."""
    out = {}
    corner = {}
    neck_map = {"0": ("neck_conv1",), "1": ("neck_norm1",), "2": ("neck_conv2",), "3": ("neck_norm2",)}
    ups_map = {"0": ("up1",), "1": ("up_norm",), "3": ("up2",)}

    def put(path, arr, transpose="auto"):
        if path[-1] == "kernel":
            if transpose == "convT" and arr.ndim == 4:
                arr = arr.transpose(2, 3, 0, 1)  # [in,out,kh,kw] → [kh,kw,in,out]
            elif arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # conv [O,I,kh,kw] → [kh,kw,I,O]
            elif arr.ndim == 2:
                arr = arr.T
        out[path] = arr

    for name, arr in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        flax_leaf = "kernel" if leaf == "weight" else leaf
        if arr.ndim == 1 and leaf == "weight":
            flax_leaf = "scale"

        if name.startswith("image_encoder.patch_embed.proj"):
            put(("image_encoder", "patch_embed", flax_leaf), arr)
        elif name == "image_encoder.pos_embed":
            out[("image_encoder", "pos_embed")] = arr
        elif _SAM_BLOCK.match(name):
            i = _SAM_BLOCK.match(name).group(1)
            rest = name[_SAM_BLOCK.match(name).end():]
            rest = (rest.replace("attn.qkv", "qkv").replace("attn.proj", "proj")
                        .replace("attn.rel_pos_h", "rel_pos_h").replace("attn.rel_pos_w", "rel_pos_w")
                        .replace("mlp.lin1", "mlp_lin1").replace("mlp.lin2", "mlp_lin2"))
            sub = rest.split(".")
            if sub[-1] in ("rel_pos_h", "rel_pos_w"):
                out[("image_encoder", f"blocks_{i}", sub[-1])] = arr
            else:
                put(("image_encoder", f"blocks_{i}", *sub[:-1], flax_leaf), arr)
        elif name.startswith("image_encoder.neck."):
            idx = parts[2]
            put(("image_encoder", *neck_map[idx], flax_leaf), arr)
        elif name == "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            out[("prompt_encoder", "pe_gaussian")] = arr
        elif name == "prompt_encoder.no_mask_embed.weight":
            out[("prompt_encoder", "no_mask_embed")] = arr.reshape(-1)
        elif name.startswith("prompt_encoder.point_embeddings."):
            # entries 2 and 3 are the box corner embeddings
            idx = int(parts[2])
            if idx in (2, 3):
                corner[idx] = arr.reshape(-1)
        elif _SAM_DEC_LAYER.match(name):
            i = _SAM_DEC_LAYER.match(name).group(1)
            rest = name[_SAM_DEC_LAYER.match(name).end():]
            rest = rest.replace("mlp.lin1", "mlp_lin1").replace("mlp.lin2", "mlp_lin2")
            sub = rest.split(".")
            put(("mask_decoder", f"layers_{i}", *sub[:-1], flax_leaf), arr)
        elif name.startswith("mask_decoder.transformer.final_attn_token_to_image."):
            sub = parts[3:]
            put(("mask_decoder", "final_attn_token_to_image", *sub[:-1], flax_leaf), arr)
        elif name.startswith("mask_decoder.transformer.norm_final_attn"):
            put(("mask_decoder", "norm_final_attn", flax_leaf), arr)
        elif name == "mask_decoder.iou_token.weight":
            out[("mask_decoder", "iou_token")] = arr
        elif name == "mask_decoder.mask_tokens.weight":
            out[("mask_decoder", "mask_tokens")] = arr
        elif name.startswith("mask_decoder.output_upscaling."):
            idx = parts[2]
            if idx in ups_map:
                put(("mask_decoder", *ups_map[idx], flax_leaf), arr,
                    transpose="convT" if idx in ("0", "3") else "auto")
        elif name.startswith("mask_decoder.output_hypernetworks_mlps."):
            i, j = parts[2], parts[4]
            put(("mask_decoder", f"hyper_{i}_lin{j}", flax_leaf), arr)
        elif name.startswith("mask_decoder.iou_prediction_head.layers."):
            j = parts[3]
            put(("mask_decoder", f"iou_lin{j}", flax_leaf), arr)
        # else: point/mask prompt embeddings and buffers are dropped

    if 2 in corner and 3 in corner:
        out[("prompt_encoder", "corner_embed")] = np.stack([corner[2], corner[3]])
    if dtype is not None:
        out = {k: (v.astype(dtype) if v.dtype in (np.float32, np.float16) else v)
               for k, v in out.items()}
    return traverse_util.unflatten_dict({k: jnp.asarray(v) for k, v in out.items()})


def load_sam_params(ckpt_path_or_dir: str, dtype=np.float32) -> Dict:
    """Load a segment-anything .pth/.safetensors checkpoint."""
    import os as _os

    if _os.path.isdir(ckpt_path_or_dir):
        sd = load_torch_state_dict(ckpt_path_or_dir)
    else:
        import torch

        raw = torch.load(ckpt_path_or_dir, map_location="cpu", weights_only=True)
        sd = {k: v.float().numpy() for k, v in raw.items()}
    return convert_sam_state_dict(sd, dtype=dtype)


_CLIP_VISION_LAYER = re.compile(r"vision_model\.encoder\.layers\.(\d+)\.")


def convert_clip_vision_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """HF CLIPVisionModel(WithProjection) → our CLIPVisionModel params."""
    out = {}
    for name, arr in sd.items():
        if name.startswith("vision_model.embeddings.patch_embedding"):
            out[("patch_embedding", "kernel")] = arr.transpose(2, 3, 1, 0)
            continue
        if name.startswith("vision_model.embeddings.class_embedding"):
            out[("class_embedding",)] = arr.reshape(-1)
            continue
        if name.startswith("vision_model.embeddings.position_embedding"):
            out[("position_embedding",)] = arr
            continue
        for ln in ("pre_layrnorm", "post_layernorm"):
            if name.startswith(f"vision_model.{ln}"):
                leaf = "scale" if name.endswith("weight") else "bias"
                out[(ln, leaf)] = arr
                break
        else:
            if name == "visual_projection.weight":
                out[("visual_projection", "kernel")] = arr.T
                continue
            m = _CLIP_VISION_LAYER.match(name)
            if m:
                rest = name[m.end():].replace("self_attn.", "").replace("mlp.", "")
                parts = rest.split(".")
                leaf, mod = parts[-1], parts[0]
                if leaf == "weight":
                    leaf = "scale" if arr.ndim == 1 else "kernel"
                    if arr.ndim == 2:
                        arr = arr.T
                out[(f"layers_{m.group(1)}", mod, leaf)] = arr
    if dtype is not None:
        out = {k: (v.astype(dtype) if v.dtype in (np.float32, np.float16) else v)
               for k, v in out.items()}
    return traverse_util.unflatten_dict({k: jnp.asarray(v) for k, v in out.items()})


def load_clip_vision_params(enc_dir: str, dtype=np.float32) -> Dict:
    return convert_clip_vision_state_dict(load_torch_state_dict(enc_dir), dtype=dtype)


def _unet3d_rename(name: str) -> str:
    """diffusers ``I2VGenXLUNet`` param name → our flax dotted path."""
    name = re.sub(
        r"(down_blocks|up_blocks)\.(\d+)\.(resnets|attentions|temp_convs|"
        r"temp_attentions|downsamplers|upsamplers)\.(\d+)",
        r"\1_\2_\3_\4", name)
    name = re.sub(r"mid_block\.(resnets|attentions|temp_convs|temp_attentions)\.(\d+)",
                  r"mid_block_\1_\2", name)
    name = re.sub(r"transformer_blocks\.(\d+)", r"transformer_blocks_\1", name)
    name = name.replace("ff.net.0.proj", "ff.net_0_proj").replace("ff.net.2", "ff.net_2")
    name = name.replace("to_out.0", "to_out_0")
    # TemporalConvLayer stages: convK.0 = GroupNorm → normK; the conv sits at
    # Sequential index 2 (stage 1) or 3 (stages 2-4, after Dropout)
    name = re.sub(r"\.conv(\d)\.0\.", r".norm\1.", name)
    name = re.sub(r"\.conv(\d)\.(?:2|3)\.", r".conv\1.", name)
    # conditioning stacks (HF nn.Sequential indices)
    for hf, ours in (
        ("image_latents_proj_in.0", "image_latents_proj_in_conv1"),
        ("image_latents_proj_in.2", "image_latents_proj_in_conv2"),
        ("image_latents_proj_in.4", "image_latents_proj_in_conv3"),
        ("image_latents_context_embedding.0", "image_latents_context_embedding_conv1"),
        ("image_latents_context_embedding.3", "image_latents_context_embedding_conv2"),
        ("image_latents_context_embedding.5", "image_latents_context_embedding_conv3"),
        ("context_embedding.0", "context_embedding.linear_1"),
        ("context_embedding.2", "context_embedding.linear_2"),
        ("fps_embedding.0", "fps_embedding.linear_1"),
        ("fps_embedding.2", "fps_embedding.linear_2"),
    ):
        name = name.replace(hf + ".", ours + ".")
    return name


def convert_unet3d_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """diffusers ``I2VGenXLUNet`` (ali-vilab/i2vgen-xl) → our
    ``UNet3DConditionModel`` params.

    Handles: temporal Conv3d [O,I,3,1,1] → length-3 conv1d kernels; the
    spatial transformers' 1x1-conv proj_in/proj_out (use_linear_projection
    =False upstream) → linear kernels; the usual linear/conv transposes."""
    out = {}
    for name, arr in sd.items():
        name = _unet3d_rename(name)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim == 1:
                leaf = "scale"
            else:
                leaf = "kernel"
                if arr.ndim == 5:  # Conv3d [O,I,3,1,1] → [3,1,1,I,O]
                    arr = arr.transpose(2, 3, 4, 1, 0)
                elif arr.ndim == 4:
                    if parts[-2] in ("proj_in", "proj_out") and arr.shape[-2:] == (1, 1):
                        arr = arr[:, :, 0, 0].T
                    else:
                        arr = arr.transpose(2, 3, 1, 0)
                elif arr.ndim == 2:
                    arr = arr.T
        if dtype is not None and arr.dtype in (np.float32, np.float16):
            arr = arr.astype(dtype)
        out[tuple(parts[:-1]) + (leaf,)] = jnp.asarray(arr)
    return traverse_util.unflatten_dict(out)


def load_unet3d_params(unet_dir: str, dtype=np.float32) -> Dict:
    """Load an HF-layout I2VGen-XL UNet checkpoint dir."""
    return convert_unet3d_state_dict(load_torch_state_dict(unet_dir), dtype=dtype)


_OWLVIT_VISION_LAYER = re.compile(r"vision_model\.encoder\.layers\.(\d+)\.")


def convert_detector_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """HF ``OwlViTForObjectDetection`` → our ``TextBoxDetector`` params.

    The detection path uses: vision tower, text tower + text_projection,
    the merged-feature layernorm (HF ``layer_norm``), class head and box
    head. ``owlvit.visual_projection`` and the global ``owlvit.logit_scale``
    belong to the contrastive-pretraining path and are dropped."""
    out = {}
    text_sd = {}
    head_map = {
        "class_head.dense0": ("class_head_dense0",),
        "class_head.logit_shift": ("logit_shift",),
        "class_head.logit_scale": ("logit_scale",),
        "box_head.dense0": ("box_head_dense0",),
        "box_head.dense1": ("box_head_dense1",),
        "box_head.dense2": ("box_head_dense2",),
    }
    for name, arr in sd.items():
        if name.startswith("owlvit."):
            name = name[len("owlvit."):]
        if name.startswith("text_model.") or name == "text_projection.weight":
            text_sd[name] = arr
            continue
        if name.startswith("vision_model."):
            rest = name[len("vision_model."):]
            if rest.startswith("embeddings.patch_embedding"):
                out[("vision_model", "patch_embedding", "kernel")] = arr.transpose(2, 3, 1, 0)
            elif rest.startswith("embeddings.class_embedding"):
                out[("vision_model", "class_embedding")] = arr.reshape(-1)
            elif rest.startswith("embeddings.position_embedding"):
                out[("vision_model", "position_embedding")] = arr
            elif rest.startswith(("pre_layernorm", "pre_layrnorm", "post_layernorm")):
                mod = "pre_layernorm" if rest.startswith("pre_lay") else "post_layernorm"
                leaf = "scale" if rest.endswith("weight") else "bias"
                out[("vision_model", mod, leaf)] = arr
            else:
                m = _OWLVIT_VISION_LAYER.match(name)
                if m:
                    r = name[m.end():].replace("self_attn.", "").replace("mlp.", "")
                    parts = r.split(".")
                    leaf, mod = parts[-1], parts[0]
                    if leaf == "weight":
                        leaf = "scale" if arr.ndim == 1 else "kernel"
                        if arr.ndim == 2:
                            arr = arr.T
                    out[("vision_model", f"layers_{m.group(1)}", mod, leaf)] = arr
            continue
        if name.startswith("layer_norm."):
            leaf = "scale" if name.endswith("weight") else "bias"
            out[("merged_layer_norm", leaf)] = arr
            continue
        for hf_name, path in head_map.items():
            if name.startswith(hf_name + "."):
                leaf = "kernel" if name.endswith("weight") else "bias"
                out[path + (leaf,)] = arr.T if leaf == "kernel" else arr
                break
        # else: visual_projection / logit_scale / buffers are dropped

    for path, arr in traverse_util.flatten_dict(
        convert_clip_state_dict(text_sd)
    ).items():
        out[("text_model",) + path] = arr

    if dtype is not None:
        out = {k: (v.astype(dtype) if v.dtype in (np.float32, np.float16) else v)
               for k, v in out.items()}
    return traverse_util.unflatten_dict({k: jnp.asarray(v) for k, v in out.items()})


def load_detector_params(det_dir: str, dtype=np.float32) -> Dict:
    """Load an HF-layout OWL-ViT detection checkpoint dir."""
    return convert_detector_state_dict(load_torch_state_dict(det_dir), dtype=dtype)


def load_unet_params(unet_dir: str, dtype=np.float32) -> Dict:
    return convert_unet_state_dict(load_torch_state_dict(unet_dir), dtype=dtype)


def load_vae_params(vae_dir: str, dtype=np.float32) -> Dict:
    return convert_vae_state_dict(load_torch_state_dict(vae_dir), dtype=dtype)


def vae_config_overrides(vae_dir: str) -> Dict:
    """Read decode-relevant fields from a checkpoint's HF ``config.json``:
    ``scaling_factor`` plus the optional ``latents_mean``/``latents_std``
    the reference's final decode denormalizes with when a VAE configures
    them (fusion_sampling.py:505-518). Returns kwargs for ``VAEConfig``;
    empty when the file is absent (the default fp16-fix SDXL VAE ships
    neither statistic)."""
    import json

    path = os.path.join(vae_dir, "config.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        cfg = json.load(f)
    out = {}
    if cfg.get("scaling_factor") is not None:
        out["scaling_factor"] = float(cfg["scaling_factor"])
    if cfg.get("latents_mean") is not None and cfg.get("latents_std") is not None:
        out["latents_mean"] = tuple(float(v) for v in cfg["latents_mean"])
        out["latents_std"] = tuple(float(v) for v in cfg["latents_std"])
    return out


def load_clip_params(enc_dir: str, dtype=np.float32) -> Dict:
    return convert_clip_state_dict(load_torch_state_dict(enc_dir), dtype=dtype)


# ---------------------------------------------------------------------------
# GroundingDINO (models/dino.py) — the reference's shipped detector weights
# (text_segment/lang_sam/lang_sam.py:89-93, groundingdino_swinb_cogcoor.pth)
# ---------------------------------------------------------------------------

# leaves that are 2-D but must NOT be transposed (tables/embeddings)
_DINO_NO_TRANSPOSE = (
    "relative_position_bias_table",
    "word_embeddings",
    "position_embeddings",
    "token_type_embeddings",
    "query_position_embeddings",
    "level_embed",
)


def _dino_original_to_hf(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pre-rename the ORIGINAL groundingdino repo layout (the reference's
    shipped ``groundingdino_swinb_cogcoor.pth`` after clean_state_dict) to
    the HF ``GroundingDinoForObjectDetection`` layout, then the HF pass
    below does the flax conversion. The HF path is torch-parity-tested;
    this rename is best-effort from the upstream module names and should be
    spot-checked per docs/RUNBOOK.md the first time real weights load
    (strict ``validate_params_tree`` fails loudly on any miss)."""
    out = {}
    for name, arr in sd.items():
        n = name
        if n.startswith("module."):
            n = n[len("module."):]
        if n.startswith("backbone.0."):
            n = n[len("backbone.0."):]
            if n.startswith("patch_embed.proj"):
                n = n.replace("patch_embed.proj", "embeddings.patch_embeddings.projection")
            elif n.startswith("patch_embed.norm"):
                n = n.replace("patch_embed.norm", "embeddings.norm")
            elif re.match(r"norm(\d)\.", n):
                k = int(n[4])
                n = f"hidden_states_norms.stage{k + 1}." + n.split(".", 1)[1]
            else:
                n = "encoder." + n
                n = n.replace(".norm1.", ".layernorm_before.")
                n = n.replace(".norm2.", ".layernorm_after.")
                n = n.replace(".attn.proj.", ".attention.output.dense.")
                n = n.replace(".attn.relative_position_bias_table",
                              ".attention.self.relative_position_bias_table")
                n = n.replace(".attn.relative_position_index",
                              ".attention.self.relative_position_index")
                n = n.replace(".mlp.fc1.", ".intermediate.dense.")
                n = n.replace(".mlp.fc2.", ".output.dense.")
                if ".attn.qkv." in n:
                    # merged qkv → separate query/key/value
                    q, k, v = np.split(arr, 3, axis=0)
                    for part, a in (("query", q), ("key", k), ("value", v)):
                        out["model.backbone.conv_encoder.model."
                            + n.replace(".attn.qkv.", f".attention.self.{part}.")] = a
                    continue
            out["model.backbone.conv_encoder.model." + n] = arr
            continue
        if n.startswith("bert."):
            if "pooler" in n or n.endswith("position_ids"):
                continue
            out["model.text_backbone." + n[len("bert."):]] = arr
            continue
        if n.startswith("feat_map."):
            out["model.text_projection." + n[len("feat_map."):]] = arr
            continue
        if n.startswith("input_proj."):
            out["model.input_proj_vision." + n[len("input_proj."):]] = arr
            continue
        if n.startswith("bbox_embed."):
            out[n] = arr
            continue
        if n.startswith("transformer."):
            n = n[len("transformer."):]
            if n == "level_embed":
                out["model.level_embed"] = arr
                continue
            if n.startswith("tgt_embed."):
                out["model.query_position_embeddings.weight"] = arr
                continue
            if n.startswith("enc_output."):
                out["model.enc_output." + n[len("enc_output."):]] = arr
                continue
            if n.startswith("enc_output_norm."):
                out["model.enc_output_norm." + n[len("enc_output_norm."):]] = arr
                continue
            if n.startswith("enc_out_bbox_embed."):
                out["model.encoder_output_bbox_embed." + n[len("enc_out_bbox_embed."):]] = arr
                continue
            if n.startswith("decoder.bbox_embed."):
                out["bbox_embed." + n[len("decoder.bbox_embed."):]] = arr
                continue
            if n.startswith("decoder.norm."):
                out["model.decoder.layer_norm." + n[len("decoder.norm."):]] = arr
                continue
            if n.startswith("decoder.ref_point_head."):
                out["model.decoder.reference_points_head."
                    + n[len("decoder.ref_point_head."):]] = arr
                continue
            m = re.match(r"encoder\.layers\.(\d+)\.(.*)", n)
            if m:
                i, rest = m.group(1), m.group(2)
                rest = rest.replace("linear1.", "fc1.").replace("linear2.", "fc2.")
                rest = rest.replace("norm1.", "self_attn_layer_norm.")
                rest = rest.replace("norm2.", "final_layer_norm.")
                out[f"model.encoder.layers.{i}.deformable_layer.{rest}"] = arr
                continue
            m = re.match(r"encoder\.text_layers\.(\d+)\.(.*)", n)
            if m:
                i, rest = m.group(1), m.group(2)
                rest = rest.replace("linear1.", "fc1.").replace("linear2.", "fc2.")
                rest = rest.replace("norm1.", "layer_norm_before.")
                rest = rest.replace("norm2.", "layer_norm_after.")
                base = f"model.encoder.layers.{i}.text_enhancer_layer."
                if "self_attn.in_proj_" in rest:
                    leaf = "weight" if rest.endswith("weight") else "bias"
                    q, k, v = np.split(arr, 3, axis=0)
                    for part, a in (("query", q), ("key", k), ("value", v)):
                        out[base + f"self_attn.{part}.{leaf}"] = a
                    continue
                out[base + rest] = arr
                continue
            m = re.match(r"encoder\.fusion_layers\.(\d+)\.(.*)", n)
            if m:
                i, rest = m.group(1), m.group(2)
                rest = (rest.replace("gamma_v", "vision_param")
                        .replace("gamma_l", "text_param")
                        .replace("layer_norm_v.", "layer_norm_vision.")
                        .replace("layer_norm_l.", "layer_norm_text.")
                        .replace("attn.values_v_proj.", "attn.values_vision_proj.")
                        .replace("attn.values_l_proj.", "attn.values_text_proj.")
                        .replace("attn.out_v_proj.", "attn.out_vision_proj.")
                        .replace("attn.out_l_proj.", "attn.out_text_proj.")
                        .replace("attn.v_proj.", "attn.vision_proj.")
                        .replace("attn.l_proj.", "attn.text_proj."))
                out[f"model.encoder.layers.{i}.fusion_layer.{rest}"] = arr
                continue
            m = re.match(r"decoder\.layers\.(\d+)\.(.*)", n)
            if m:
                i, rest = m.group(1), m.group(2)
                rest = (rest.replace("cross_attn_text.", "encoder_attn_text.")
                        .replace("ca_text.", "encoder_attn_text.")
                        .replace("catext_norm.", "encoder_attn_text_layer_norm.")
                        .replace("cross_attn.", "encoder_attn.")
                        .replace("norm1.", "encoder_attn_layer_norm.")
                        .replace("norm2.", "self_attn_layer_norm.")
                        .replace("norm3.", "final_layer_norm.")
                        .replace("linear1.", "fc1.").replace("linear2.", "fc2."))
                base = f"model.decoder.layers.{i}."
                if "in_proj_" in rest:
                    leaf = "weight" if rest.endswith("weight") else "bias"
                    mod = rest.split(".in_proj_")[0]
                    q, k, v = np.split(arr, 3, axis=0)
                    for part, a in (("query", q), ("key", k), ("value", v)):
                        out[base + f"{mod}.{part}.{leaf}"] = a
                    continue
                out[base + rest] = arr
                continue
        # anything unmapped passes through; validate_params_tree reports it
        out[n] = arr
    return out


def convert_grounding_dino_state_dict(sd: Dict[str, np.ndarray], dtype=None) -> Dict:
    """HF ``GroundingDinoForObjectDetection`` (or the original groundingdino
    repo layout, auto-detected) → our ``models/dino.py::GroundingDino``
    params. Torch-parity-tested at tiny scale in tests/test_dino_parity.py."""
    if any(k.startswith(("transformer.", "bert.", "backbone.0."))
           or k.startswith("module.") for k in sd):
        sd = _dino_original_to_hf(sd)

    out = {}
    bbox_seen = set()
    for name, arr in sd.items():
        n = name
        if n.endswith("position_ids") or n.endswith("relative_position_index"):
            continue  # buffers
        # the shared bbox head appears decoder_layers times; keep one copy
        m = re.match(r"(?:model\.decoder\.)?bbox_embed\.(\d+)\.(.*)", n)
        if m:
            if m.group(1) != "0":
                continue
            n = "bbox_embed." + m.group(2)
            if n in bbox_seen:
                continue
            bbox_seen.add(n)
        if n.startswith("model."):
            n = n[len("model."):]

        # --- section renames (HF name → our flax path, dot-separated) ---
        if n.startswith("backbone.conv_encoder.model."):
            n = n[len("backbone.conv_encoder.model."):]
            n = n.replace("embeddings.patch_embeddings.projection", "patch_embed")
            n = n.replace("embeddings.norm", "patch_norm")
            n = re.sub(r"encoder\.layers\.(\d+)\.blocks\.(\d+)\.",
                       r"layers_\1_blocks_\2.", n)
            n = re.sub(r"encoder\.layers\.(\d+)\.downsample\.",
                       r"layers_\1_downsample.", n)
            n = n.replace("attention.self.", "attention.")
            n = n.replace("attention.output.dense", "attention.out")
            n = n.replace("intermediate.dense", "intermediate")
            n = re.sub(r"output\.dense\.(weight|bias)$", r"output.\1", n)
            n = re.sub(r"hidden_states_norms\.stage(\d+)", r"norm_stage\1", n)
            n = "backbone." + n
        elif n.startswith("text_backbone."):
            n = n[len("text_backbone."):]
            n = n.replace("embeddings.word_embeddings.weight", "word_embeddings")
            n = n.replace("embeddings.position_embeddings.weight", "position_embeddings")
            n = n.replace("embeddings.token_type_embeddings.weight", "token_type_embeddings")
            n = n.replace("embeddings.LayerNorm", "embeddings_norm")
            n = re.sub(r"encoder\.layer\.(\d+)\.", r"layer_\1.", n)
            n = n.replace("attention.self.", "")
            n = n.replace("attention.output.dense", "attn_out")
            n = n.replace("attention.output.LayerNorm", "attn_norm")
            n = n.replace("intermediate.dense", "intermediate")
            n = n.replace("output.dense", "output")
            n = n.replace("output.LayerNorm", "output_norm")
            n = "text_backbone." + n
        elif re.match(r"input_proj_vision\.(\d+)\.(0|1)\.", n):
            m = re.match(r"input_proj_vision\.(\d+)\.(0|1)\.(.*)", n)
            kind = "conv" if m.group(2) == "0" else "norm"
            n = f"input_proj_{m.group(1)}_{kind}.{m.group(3)}"
        elif n.startswith("query_position_embeddings.weight"):
            n = "query_position_embeddings.embedding"
        elif n.startswith("encoder.layers."):
            n = re.sub(r"encoder\.layers\.(\d+)\.", r"encoder_layers_\1.", n)
        elif n.startswith("decoder.layers."):
            n = re.sub(r"decoder\.layers\.(\d+)\.", r"decoder_layers_\1.", n)
        elif n.startswith("decoder.layer_norm."):
            n = n.replace("decoder.layer_norm.", "decoder_layer_norm.")
        elif n.startswith("decoder.reference_points_head."):
            n = n.replace("decoder.reference_points_head.", "reference_points_head.")
        n = re.sub(r"layers\.(\d+)\.", r"layers_\1.", n)  # MLP heads

        parts = n.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim == 1:
                leaf = "scale"
            else:
                leaf = "kernel"
                if any(t in parts[-2] for t in ("patch_embed",)) or arr.ndim == 4:
                    if arr.ndim == 4:
                        arr = arr.transpose(2, 3, 1, 0)
                elif parts[-2] in ("word_embeddings", "position_embeddings",
                                   "token_type_embeddings"):
                    leaf = parts[-2]
                    parts = parts[:-1]
                elif arr.ndim == 2:
                    arr = arr.T
        if leaf in ("vision_param", "text_param", "level_embed",
                    "relative_position_bias_table", "word_embeddings",
                    "position_embeddings", "token_type_embeddings", "embedding"):
            pass  # untransposed leaves keep their own names
        else:
            parts[-1] = leaf
        if dtype is not None and arr.dtype in (np.float32, np.float16):
            arr = arr.astype(dtype)
        out[tuple(parts)] = jnp.asarray(arr)
    return traverse_util.unflatten_dict(out)


def load_dino_params(path: str, dtype=np.float32) -> Dict:
    """Load a GroundingDINO checkpoint: an HF-layout dir (safetensors/bin)
    or the original repo's single ``.pth`` file (``{"model": state_dict}``,
    e.g. groundingdino_swinb_cogcoor.pth)."""
    if os.path.isdir(path):
        sd = load_torch_state_dict(path)
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("model", ckpt)
        sd = {k: np.asarray(v.float().numpy()) for k, v in sd.items()}
    return convert_grounding_dino_state_dict(sd, dtype=dtype)


def validate_dino_params(cfg, params) -> None:
    from tweediemix_tpu.models.dino import GroundingDino

    model = GroundingDino(cfg)
    s = cfg.swin.image_size
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        _S((1, s, s, 3)), _S((1, 8), np.int32), _S((1, 8, 8), bool),
        _S((1, 8), np.int32), _S((1, 8), bool),
    )["params"]
    validate_params_tree(params, shapes, "grounding-dino")
