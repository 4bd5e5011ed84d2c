"""Quantitative evaluation: CLIP text- and image-alignment scores.

The reference repo ships no evaluation code; the TweedieMix paper (arXiv
2410.05591, README.md:3) reports CLIP text-similarity and image-similarity
following the Custom Diffusion protocol:

- **CLIP-T** — cosine similarity between a generated image's CLIP image
  embedding and the CLIP text embedding of its prompt, with the learned
  modifier tokens (``<new1>`` …) stripped from the prompt.
- **CLIP-I** — mean cosine similarity between the generated image's
  embedding and the embeddings of the concept's real instance images.

Both run on-TPU with the framework's own Flax CLIP towers
(``models/clip.py``); any HF ``CLIPModel`` checkpoint dir (both towers +
projections in one state dict, e.g. ``openai/clip-vit-large-patch14``)
loads through the existing ``models/convert.py`` converters, which key on
the ``text_model.`` / ``vision_model.`` prefixes and ignore the other
tower's tensors.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.models.clip import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
)


def clip_preprocess(img01: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """[H, W, 3] in [0, 1] → [S, S, 3] normalized with CLIP stats.

    Shortest-side bilinear resize + center crop — the CLIPImageProcessor
    default pipeline (do_resize + do_center_crop + do_normalize)."""
    h, w = img01.shape[:2]
    if h <= w:
        th, tw = image_size, max(image_size, int(round(w * image_size / h)))
    else:
        th, tw = max(image_size, int(round(h * image_size / w))), image_size
    resized = jax.image.resize(img01, (th, tw, 3), "bilinear")
    y0 = (th - image_size) // 2
    x0 = (tw - image_size) // 2
    crop = jax.lax.dynamic_slice(resized, (y0, x0, 0), (image_size, image_size, 3))
    return (crop - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)


def strip_modifier_tokens(prompt: str, modifier_tokens: Sequence[str]) -> str:
    """Remove learned placeholder tokens (``<new1>`` …) from an eval prompt
    (the Custom Diffusion CLIP-T protocol scores the natural-language
    prompt, which a generic CLIP has never seen the placeholders of)."""
    for tok in modifier_tokens:
        if tok:
            prompt = prompt.replace(tok, " ")
    return re.sub(r"\s+", " ", prompt).strip()


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-8)


@dataclasses.dataclass
class CLIPScorer:
    """Joint-space CLIP embedder + the two alignment metrics."""

    text_cfg: CLIPTextConfig
    vision_cfg: CLIPVisionConfig
    text_params: dict
    vision_params: dict
    tokenizer: object  # CLIPBPETokenizer / HashTokenizer contract

    def __post_init__(self):
        text = CLIPTextModel(self.text_cfg)
        vision = CLIPVisionModel(self.vision_cfg)
        # pooled+projected outputs are the joint-space embeddings
        self._embed_text = jax.jit(
            lambda p, ids: _l2norm(text.apply({"params": p}, ids)[2])
        )
        self._embed_image = jax.jit(
            lambda p, px: _l2norm(vision.apply({"params": p}, px))
        )

    # -- construction --------------------------------------------------------

    @classmethod
    def from_pretrained(cls, clip_dir: str, dtype=np.float32) -> "CLIPScorer":
        """Load an HF CLIPModel dir: config.json with text_config /
        vision_config + one state dict holding both towers + projections,
        and the tokenizer files (vocab.json / merges.txt) alongside."""
        from tweediemix_tpu.models.convert import (
            convert_clip_state_dict,
            convert_clip_vision_state_dict,
            load_torch_state_dict,
            validate_clip_params,
            validate_clip_vision_params,
        )
        from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer

        with open(os.path.join(clip_dir, "config.json")) as f:
            cfg = json.load(f)
        tc, vc = cfg.get("text_config", {}), cfg.get("vision_config", {})
        proj = cfg.get("projection_dim", tc.get("projection_dim", 512))
        tokenizer = CLIPBPETokenizer.from_dir(clip_dir)
        text_cfg = CLIPTextConfig(
            vocab_size=tc.get("vocab_size", 49408),
            hidden_size=tc.get("hidden_size", 512),
            intermediate_size=tc.get("intermediate_size", 2048),
            num_layers=tc.get("num_hidden_layers", 12),
            num_heads=tc.get("num_attention_heads", 8),
            max_positions=tc.get("max_position_embeddings", 77),
            hidden_act=tc.get("hidden_act", "quick_gelu"),
            projection_dim=proj,
            # pool at the tokenizer's true EOS id, not config.json's —
            # openai/clip-* configs carry a historical eos_token_id=2 while
            # HF pools at argmax(input_ids) == 49407
            eos_token_id=tokenizer.eos_token_id,
        )
        vision_cfg = CLIPVisionConfig(
            image_size=vc.get("image_size", 224),
            patch_size=vc.get("patch_size", 32),
            hidden_size=vc.get("hidden_size", 768),
            intermediate_size=vc.get("intermediate_size", 3072),
            num_layers=vc.get("num_hidden_layers", 12),
            num_heads=vc.get("num_attention_heads", 12),
            hidden_act=vc.get("hidden_act", "quick_gelu"),
            projection_dim=proj,
        )
        sd = load_torch_state_dict(clip_dir)
        text_params = convert_clip_state_dict(sd, dtype=dtype)
        vision_params = convert_clip_vision_state_dict(sd, dtype=dtype)
        validate_clip_params(text_cfg, text_params)
        validate_clip_vision_params(vision_cfg, vision_params)
        return cls(text_cfg, vision_cfg, text_params, vision_params, tokenizer)

    @classmethod
    def tiny(cls, key=None) -> "CLIPScorer":
        """Random tiny towers + hash tokenizer (tests / smoke only)."""
        from tweediemix_tpu.utils.tokenizer import HashTokenizer

        key = key if key is not None else jax.random.PRNGKey(0)
        text_cfg = CLIPTextConfig.tiny(projection_dim=32)
        vision_cfg = CLIPVisionConfig.tiny()
        k1, k2 = jax.random.split(key)
        text_params = CLIPTextModel(text_cfg).init(
            k1, jnp.zeros((1, 8), jnp.int32))["params"]
        vision_params = CLIPVisionModel(vision_cfg).init(
            k2, jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3)))["params"]
        return cls(text_cfg, vision_cfg, text_params, vision_params,
                   HashTokenizer(vocab_size=text_cfg.vocab_size))

    # -- embeddings -----------------------------------------------------------

    def embed_texts(self, texts: Sequence[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(list(texts)), jnp.int32)
        return self._embed_text(self.text_params, ids)

    def embed_images(self, images: Sequence[np.ndarray]) -> jnp.ndarray:
        """images: list of [H, W, 3] uint8 (or [0,1] float) arrays."""
        pixels = []
        for im in images:
            arr = jnp.asarray(im)
            if arr.dtype == jnp.uint8:
                arr = arr.astype(jnp.float32) / 255.0
            pixels.append(clip_preprocess(arr, self.vision_cfg.image_size))
        return self._embed_image(self.vision_params, jnp.stack(pixels))

    # -- metrics --------------------------------------------------------------

    def clip_t(self, images: Sequence[np.ndarray], prompts: Sequence[str],
               modifier_tokens: Sequence[str] = ()) -> float:
        """Mean image↔prompt cosine similarity (prompts modifier-stripped).

        ``prompts`` is either one prompt for all images or one per image."""
        prompts = list(prompts)
        if len(prompts) == 1:
            prompts = prompts * len(images)
        if len(prompts) != len(images):
            raise ValueError(
                f"{len(prompts)} prompts for {len(images)} images")
        prompts = [strip_modifier_tokens(p, modifier_tokens) for p in prompts]
        ie = self.embed_images(images)
        te = self.embed_texts(prompts)
        return float(jnp.mean(jnp.sum(ie * te, axis=-1)))

    def clip_i(self, images: Sequence[np.ndarray],
               concept_images: Sequence[np.ndarray]) -> float:
        """Mean pairwise generated↔instance cosine similarity."""
        ge = self.embed_images(images)
        ce = self.embed_images(concept_images)
        return float(jnp.mean(ge @ ce.T))


def load_image_paths(path_or_glob: str) -> List[str]:
    """A directory (all image files, sorted) or a glob pattern."""
    import glob

    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    if os.path.isdir(path_or_glob):
        files = sorted(
            os.path.join(path_or_glob, f)
            for f in os.listdir(path_or_glob)
            if f.lower().endswith(exts)
        )
    else:
        files = sorted(glob.glob(path_or_glob))
    if not files:
        raise FileNotFoundError(f"no images found at {path_or_glob!r}")
    return files


def load_images(path_or_glob: str) -> List[np.ndarray]:
    from PIL import Image

    return [
        np.asarray(Image.open(p).convert("RGB"))
        for p in load_image_paths(path_or_glob)
    ]
