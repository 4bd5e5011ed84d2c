"""Concept-delta checkpoints: load, convert, and stack into UNet params.

The reference persists each personalized concept as a "delta dict"
``{'unet': {torch_param_name: tensor}, 'modifier_token': {tok: emb},
'modifier_token_2': {tok: emb}}`` written with ``torch.save``
(``concept_training/diffusers_training_xl_new.py:41-66``) and re-injected at
sampling time by name-matching into freshly loaded UNets
(``fusion_generation/fusion_sampling.py:156-210``).

Here deltas merge into the *param pytree* instead: ``stack_cd_params`` turns
every cross-attn ``to_k``/``to_v`` kernel into a stacked
``[N+1, ctx, inner]`` array (slot 0 = base weights) and
``stack_lora_params`` builds stacked rank-r factor pairs (slot 0 = zeros).
Concept switching is a pytree swap — no module reloading, no name matching
at runtime.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

# ---------------------------------------------------------------------------
# torch-name ↔ flax-path conversion


def torch_name_to_flax_path(name: str) -> Tuple[str, ...]:
    """Map a diffusers UNet param name to our flax param path.

    e.g. ``down_blocks.1.attentions.0.transformer_blocks.2.attn2.to_k.weight``
    → ``('down_blocks_1_attentions_0', 'transformer_blocks_2', 'attn2',
    'to_k', 'kernel')``.
    """
    name = re.sub(r"(down_blocks)\.(\d+)\.(attentions)\.(\d+)", r"\1_\2_\3_\4", name)
    name = re.sub(r"(up_blocks)\.(\d+)\.(attentions)\.(\d+)", r"\1_\2_\3_\4", name)
    name = re.sub(r"(down_blocks)\.(\d+)\.(resnets)\.(\d+)", r"\1_\2_\3_\4", name)
    name = re.sub(r"(up_blocks)\.(\d+)\.(resnets)\.(\d+)", r"\1_\2_\3_\4", name)
    name = re.sub(r"(down_blocks)\.(\d+)\.(downsamplers)\.(\d+)", r"\1_\2_\3_\4", name)
    name = re.sub(r"(up_blocks)\.(\d+)\.(upsamplers)\.(\d+)", r"\1_\2_\3_\4", name)
    name = re.sub(r"mid_block\.(attentions)\.(\d+)", r"mid_block_\1_\2", name)
    name = re.sub(r"mid_block\.(resnets)\.(\d+)", r"mid_block_\1_\2", name)
    name = re.sub(r"transformer_blocks\.(\d+)", r"transformer_blocks_\1", name)
    name = name.replace("to_out.0", "to_out_0")
    parts = name.split(".")
    leaf = parts[-1]
    if leaf == "weight":
        parts[-1] = "kernel"
    return tuple(parts)


def convert_torch_tensor(path: Tuple[str, ...], array: np.ndarray) -> np.ndarray:
    """Transpose torch layouts to flax: linear [O,I]→[I,O], conv
    [O,I,kh,kw]→[kh,kw,I,O]; norm scale/bias unchanged."""
    if path[-1] != "kernel":
        return array
    if array.ndim == 2:
        return array.T
    if array.ndim == 4:
        return array.transpose(2, 3, 1, 0)
    return array


def flax_path_to_torch_name(path: Tuple[str, ...]) -> str:
    """Inverse of ``torch_name_to_flax_path`` for the paths that appear in
    delta checkpoints (attn params, LoRA factors)."""
    parts = []
    for seg in path:
        seg = re.sub(r"(down_blocks|up_blocks)_(\d+)_(attentions|resnets|downsamplers|upsamplers)_(\d+)",
                     r"\1.\2.\3.\4", seg)
        seg = re.sub(r"mid_block_(attentions|resnets)_(\d+)", r"mid_block.\1.\2", seg)
        seg = re.sub(r"transformer_blocks_(\d+)", r"transformer_blocks.\1", seg)
        seg = seg.replace("to_out_0", "to_out.0")
        parts.append(seg)
    name = ".".join(parts)
    if name.endswith(".kernel"):
        name = name[: -len(".kernel")] + ".weight"
    return name


def save_reference_delta(
    path: str,
    unet_deltas: Dict[Tuple[str, ...], np.ndarray],
    modifier_token: Dict[str, np.ndarray],
    modifier_token_2: Dict[str, np.ndarray],
    text_encoder: Dict[str, np.ndarray] = None,
    text_encoder_2: Dict[str, np.ndarray] = None,
):
    """Write a delta checkpoint wire-compatible with the reference's
    ``save_checkpoint`` schema (``concept_training/
    diffusers_training_xl_new.py:41-66``): ``torch.save`` of
    ``{'unet': {torch_name: tensor}, 'modifier_token': {...},
    'modifier_token_2': {...}}``. Linear kernels are transposed back to
    torch's [out, in]; conv kernels to [O, I, kh, kw].

    ``text_encoder`` (HF torch-named state dict) adds the reference's
    ``save_text_encoder`` entry (:52-53), loaded by the reference with
    ``text_encoder.load_state_dict`` (diffusers_model_pipeline_xl_new.py
    :327-328). ``text_encoder_2`` is our extension for the second SDXL
    tower (the reference saves/loads only tower 1; it ignores unknown
    keys, so the file stays loadable there)."""
    import torch

    unet = {}
    for p, arr in unet_deltas.items():
        arr = np.asarray(arr, np.float32)
        if p[-1] == "kernel":
            if arr.ndim == 2:
                arr = arr.T
            elif arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
        unet[flax_path_to_torch_name(p)] = torch.from_numpy(np.array(arr, np.float32, copy=True))
    st = {
        "unet": unet,
        "modifier_token": {k: torch.from_numpy(np.array(v, np.float32, copy=True)) for k, v in modifier_token.items()},
        "modifier_token_2": {k: torch.from_numpy(np.array(v, np.float32, copy=True)) for k, v in modifier_token_2.items()},
    }
    for key, sd in (("text_encoder", text_encoder), ("text_encoder_2", text_encoder_2)):
        if sd is not None:
            st[key] = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
                       for k, v in sd.items()}
    torch.save(st, path)


# ---------------------------------------------------------------------------
# reference .bin delta loading


def load_reference_delta(path: str) -> Dict:
    """Load a reference ``delta-*.bin`` (torch.save) into numpy dicts.

    Returns ``{'unet': {flax_path_tuple: np.ndarray}, 'modifier_token':
    {tok: np.ndarray}, 'modifier_token_2': {tok: np.ndarray}}``. The low-rank
    compressed ``u@v`` form handled by the reference loader
    (``concept_training/diffusers_model_pipeline_xl_new.py:365-366``) is
    expanded on load.
    """
    import torch

    st = torch.load(path, map_location="cpu", weights_only=False)
    out = {"unet": {}, "modifier_token": {}, "modifier_token_2": {}}
    for name, tensor in st.get("unet", {}).items():
        if isinstance(tensor, (list, tuple)) and len(tensor) == 2:
            tensor = tensor[0] @ tensor[1]  # low-rank compressed delta
        arr = tensor.float().numpy()
        p = torch_name_to_flax_path(name)
        out["unet"][p] = convert_torch_tensor(p, arr)
    for coll in ("modifier_token", "modifier_token_2"):
        for tok, emb in st.get(coll, {}).items():
            out[coll][tok] = emb.float().numpy()
    # --train_text_encoder checkpoints carry full tower state dicts
    # (reference :52-53 / load at diffusers_model_pipeline_xl_new.py:327-328)
    for key in ("text_encoder", "text_encoder_2"):
        if key in st:
            from tweediemix_tpu.models.convert import convert_clip_state_dict

            out[key] = convert_clip_state_dict(
                {k: v.float().numpy() for k, v in st[key].items()}
            )
    return out


# ---------------------------------------------------------------------------
# stacking into UNet param pytrees


def _is_cross_kv(path: Tuple[str, ...]) -> bool:
    return len(path) >= 3 and path[-3] == "attn2" and path[-2] in ("to_k", "to_v") and path[-1] == "kernel"


def cd_delta_from_reference(ref_delta: Dict) -> Dict[Tuple[str, ...], np.ndarray]:
    """Extract the cross-attn K/V kernels from a loaded reference delta."""
    return {p: a for p, a in ref_delta["unet"].items() if _is_cross_kv(p)}


def stack_cd_params(params: Dict, concept_kvs: Sequence[Dict[Tuple[str, ...], np.ndarray]]) -> Dict:
    """Stack Custom-Diffusion concept K/V kernels onto base params.

    Every ``attn2/to_{k,v}/kernel`` leaf [ctx, inner] becomes
    ``attn2/to_{k,v}_stack`` [N+1, ctx, inner] with slot 0 = base and slot
    i = concept i's kernel (falling back to base where a concept checkpoint
    lacks that layer — mirrors the name-matching copy at
    ``fusion_sampling.py:206-209``).
    """
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if _is_cross_kv(path):
            stack = [np.asarray(leaf)]
            for kv in concept_kvs:
                stack.append(np.asarray(kv.get(path, leaf)))
            new_path = path[:-2] + (path[-2] + "_stack",)
            out[new_path] = jnp.asarray(np.stack(stack))
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)


def _attn_paths(flat_params) -> List[Tuple[str, ...]]:
    """All attention-module scopes (path prefixes ending in attn1/attn2)."""
    seen = []
    for path in flat_params:
        for i, part in enumerate(path):
            if part in ("attn1", "attn2"):
                prefix = path[: i + 1]
                if prefix not in seen:
                    seen.append(prefix)
    return seen


def stack_lora_params(
    params: Dict,
    concept_loras: Sequence[Dict[Tuple[str, ...], np.ndarray]],
    rank: int = 4,
) -> Dict:
    """Add stacked LoRA factor params for every attn1/attn2 module.

    ``concept_loras[i]`` maps ``attn_path + ('to_q_lora_down',)`` (etc.,
    for q/k/v/out, down [din,r] and up [r,dout]) to arrays. Slot 0 is all
    zeros (= no delta), so ``concept_idx`` 0 reproduces the base model —
    the single code path replacing the time-gated branch of
    ``utils_lora.py:63``.
    """
    flat = dict(traverse_util.flatten_dict(params))
    dims = {}  # attn path → (query_dim, ctx_dim, inner)
    for path, leaf in list(flat.items()):
        if len(path) >= 3 and path[-3] in ("attn1", "attn2"):
            prefix = path[: path.index(path[-3]) + 1]
            entry = dims.setdefault(prefix, {})
            if path[-2] == "to_q" and path[-1] == "kernel":
                entry["q_in"], entry["inner"] = leaf.shape
            if path[-2] == "to_k" and path[-1] == "kernel":
                entry["ctx_in"] = leaf.shape[0]
            if path[-2] == "to_out_0" and path[-1] == "kernel":
                entry["out_dim"] = leaf.shape[1]
    n_slots = len(concept_loras) + 1
    for prefix, d in dims.items():
        shapes = {
            "to_q_lora_down": (d["q_in"], rank),
            "to_q_lora_up": (rank, d["inner"]),
            "to_k_lora_down": (d["ctx_in"], rank),
            "to_k_lora_up": (rank, d["inner"]),
            "to_v_lora_down": (d["ctx_in"], rank),
            "to_v_lora_up": (rank, d["inner"]),
            "to_out_lora_down": (d["inner"], rank),
            "to_out_lora_up": (rank, d["out_dim"]),
        }
        for pname, shape in shapes.items():
            slots = [np.zeros(shape, np.float32)]
            for lora in concept_loras:
                slots.append(np.asarray(lora.get(prefix + (pname,), np.zeros(shape, np.float32))))
            flat[prefix + (pname,)] = jnp.asarray(np.stack(slots))
    return traverse_util.unflatten_dict(flat)


def lora_delta_from_reference(ref_delta: Dict) -> Dict[Tuple[str, ...], np.ndarray]:
    """Map reference LoRA delta names to our stacked-factor param names.

    Reference names look like
    ``...attn2.processor.to_q_lora.down.weight`` (saved by
    ``diffusers_training_xl_lora.py:64-68``); torch Linear weights are
    [out, in] and are already transposed to [in, out] by
    ``load_reference_delta``, matching our ``down [din, r]`` / ``up [r,
    dout]`` layout.
    """
    out = {}
    for path, arr in ref_delta["unet"].items():
        parts = list(path)
        if "processor" in parts:
            parts.remove("processor")
        # ('...', 'attnX', 'to_q_lora', 'down', 'kernel') → attn path + to_q_lora_down
        if len(parts) >= 3 and parts[-1] == "kernel" and parts[-3].endswith("_lora"):
            name = f"{parts[-3]}_{parts[-2]}"  # to_q_lora_down / to_q_lora_up
            out[tuple(parts[:-3]) + (name,)] = arr
    return out
