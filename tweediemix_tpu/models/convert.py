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


def load_unet_params(unet_dir: str, dtype=np.float32) -> Dict:
    return convert_unet_state_dict(load_torch_state_dict(unet_dir), dtype=dtype)


def load_vae_params(vae_dir: str, dtype=np.float32) -> Dict:
    return convert_vae_state_dict(load_torch_state_dict(vae_dir), dtype=dtype)


def load_clip_params(enc_dir: str, dtype=np.float32) -> Dict:
    return convert_clip_state_dict(load_torch_state_dict(enc_dir), dtype=dtype)
