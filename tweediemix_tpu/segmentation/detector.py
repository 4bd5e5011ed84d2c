"""Text-conditioned open-vocabulary box detector (OWL-ViT layout).

The reference uses GroundingDINO (SwinB + multi-scale deformable attention,
a custom CUDA op — ``text_segment/lang_sam/lang_sam.py:89-106``). Per the
rebuild plan (SURVEY §7.5) the TPU-native stage swaps in OWL-ViT, which
keeps the same contract — ``(image, text) → boxes (xyxy in [0,1]), scores``
— while being pure transformer math that XLA maps cleanly onto the MXU.

The module matches the HF ``OwlViTForObjectDetection`` computation and
parameter layout exactly (so ``google/owlvit-base-patch32`` checkpoints
convert with a rename+transpose pass, ``models/convert.py``):

* a CLIP ViT image tower (class token, pre/post layernorm, quick-gelu);
* the class-token-merged patch features: ``post_ln(seq)[1:] * cls``,
  then a merged layernorm;
* a text tower + projection yields one query embedding per phrase;
* class head: normalized patch·query similarity with per-patch learned
  logit shift and (elu+1) logit scale;
* box head: a 3-layer gelu MLP over patch features plus a static
  logit-space center/size bias per patch, sigmoid → cxcywh.

Static shapes: returns the top-``max_boxes`` boxes sorted by score.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.models.clip import (
    CLIPEncoderLayer,
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
)

# CLIP image-preprocessing statistics (the OwlViTProcessor normalization)
from tweediemix_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD  # noqa: E402,F401


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=lambda: CLIPVisionConfig(
            image_size=768, patch_size=32, hidden_size=768,
            intermediate_size=3072, num_layers=12, num_heads=12,
            hidden_act="quick_gelu", projection_dim=None,
        )
    )
    text: CLIPTextConfig = dataclasses.field(
        default_factory=lambda: CLIPTextConfig(
            hidden_size=512, intermediate_size=2048, num_layers=12,
            num_heads=8, max_positions=16, hidden_act="quick_gelu",
            projection_dim=512,
        )
    )
    embed_dim: int = 512
    max_boxes: int = 8

    @staticmethod
    def owlvit_base_patch32(**kw) -> "DetectorConfig":
        """google/owlvit-base-patch32 (the defaults)."""
        return DetectorConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "DetectorConfig":
        defaults = dict(
            vision=CLIPVisionConfig.tiny(projection_dim=None),
            text=CLIPTextConfig.tiny(max_positions=16, projection_dim=32),
            embed_dim=32,
            max_boxes=4,
        )
        defaults.update(kw)
        return DetectorConfig(**defaults)


def _box_bias(g: int) -> np.ndarray:
    """OWL-ViT's static per-patch box bias in logit space.

    Mirrors ``OwlViTForObjectDetection.compute_box_bias``: patch
    'coordinates' are the normalized (col+1, row+1)/g corners (upstream
    quirk, kept for weight compatibility), size prior is 1/g."""
    coords = np.stack(
        np.meshgrid(np.arange(1, g + 1), np.arange(1, g + 1)), axis=-1
    ).astype(np.float32) / g  # [g, g, 2] = (x, y) per (row, col)
    coords = coords.reshape(-1, 2)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full_like(coords, 1.0 / g)
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return np.concatenate([coord_bias, size_bias], axis=-1)  # [g*g, 4]


class OwlViTVisionTower(nn.Module):
    """CLIP ViT returning the post-layernormed FULL sequence (cls + patches)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=cfg.dtype, name="patch_embedding",
        )(pixels.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02),
                             (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.tile(cls_tok[None, None], (b, 1, 1)).astype(cfg.dtype), x], axis=1
        )
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], cfg.hidden_size), jnp.float32)
        x = x + pos.astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="pre_layernorm")(x)
        text_like = CLIPTextConfig(
            hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            hidden_act=cfg.hidden_act, dtype=cfg.dtype,
        )
        mask = jnp.ones((x.shape[1], x.shape[1]), bool)[None, None]  # non-causal
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(text_like, name=f"layers_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="post_layernorm")(x)


class TextBoxDetector(nn.Module):
    config: DetectorConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, text_ids: jnp.ndarray):
        """pixels [1, S, S, 3] (CLIP-normalized), text_ids [1, T] →
        (boxes [max_boxes, 4] xyxy in [0,1], scores [max_boxes])."""
        cfg = self.config
        v = cfg.vision
        g = v.image_size // v.patch_size

        seq = OwlViTVisionTower(v, name="vision_model")(pixels)
        # class-token merge + merged layernorm (modeling_owlvit image_text_embedder)
        feats = seq[:, 1:, :] * seq[:, :1, :]
        feats = nn.LayerNorm(epsilon=1e-5, dtype=v.dtype, name="merged_layer_norm")(feats)

        query = CLIPTextModel(cfg.text, name="text_model")(text_ids)[2]

        # class head (OwlViTClassPredictionHead)
        img_cls = nn.Dense(cfg.embed_dim, dtype=v.dtype, name="class_head_dense0")(feats)
        img_n = img_cls / (jnp.linalg.norm(img_cls, axis=-1, keepdims=True) + 1e-6)
        q_n = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-6)
        logits = jnp.einsum(
            "bpd,bd->bp", img_n.astype(jnp.float32), q_n.astype(jnp.float32)
        )
        shift = nn.Dense(1, dtype=v.dtype, name="logit_shift")(feats)[..., 0]
        scale = nn.Dense(1, dtype=v.dtype, name="logit_scale")(feats)[..., 0]
        scale = jax.nn.elu(scale.astype(jnp.float32)) + 1.0
        logits = (logits + shift.astype(jnp.float32)) * scale
        scores = jax.nn.sigmoid(logits)[0]  # [P]

        # box head (OwlViTBoxPredictionHead + compute_box_bias)
        h = jax.nn.gelu(nn.Dense(v.hidden_size, dtype=v.dtype, name="box_head_dense0")(feats),
                        approximate=False)
        h = jax.nn.gelu(nn.Dense(v.hidden_size, dtype=v.dtype, name="box_head_dense1")(h),
                        approximate=False)
        raw = nn.Dense(4, dtype=v.dtype, name="box_head_dense2")(h)[0]
        cxcywh = jax.nn.sigmoid(raw.astype(jnp.float32) + jnp.asarray(_box_bias(g)))
        cxcy, wh = cxcywh[:, :2], cxcywh[:, 2:]
        boxes_xyxy = jnp.clip(
            jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1), 0.0, 1.0
        )

        top = jax.lax.top_k(scores, cfg.max_boxes)
        return boxes_xyxy[top[1]], top[0]
