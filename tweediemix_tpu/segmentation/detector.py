"""Text-conditioned open-vocabulary box detector.

The reference uses GroundingDINO (SwinB + multi-scale deformable attention,
a custom CUDA op — ``text_segment/lang_sam/lang_sam.py:89-106``). Per the
rebuild plan (SURVEY §7.5) the TPU-native stage swaps in an OWL-ViT-style
detector that keeps the same contract — ``(image, text) → boxes (cxcywh →
xyxy), logits, phrases`` — while being pure transformer math that XLA maps
cleanly onto the MXU:

* a ViT image tower yields per-patch embeddings;
* a text tower yields a query embedding;
* a box head regresses one box per patch token (cxcywh, sigmoid);
* a similarity head scores patch ⋅ text; boxes above ``box_threshold``
  survive, sorted by score.

Static shapes: returns the top-``max_boxes`` boxes with a validity mask.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from tweediemix_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
)
from tweediemix_tpu.models.clip import CLIPEncoderLayer


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    vision: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    embed_dim: int = 512
    max_boxes: int = 8

    @staticmethod
    def tiny(**kw) -> "DetectorConfig":
        defaults = dict(
            vision=CLIPVisionConfig.tiny(projection_dim=None),
            text=CLIPTextConfig.tiny(),
            embed_dim=32,
            max_boxes=4,
        )
        defaults.update(kw)
        return DetectorConfig(**defaults)


class TextBoxDetector(nn.Module):
    config: DetectorConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, text_ids: jnp.ndarray):
        """pixels [1, S, S, 3], text_ids [1, T] →
        (boxes [max_boxes, 4] xyxy in [0,1], scores [max_boxes], valid)."""
        cfg = self.config
        v = cfg.vision
        b = pixels.shape[0]
        x = nn.Conv(
            v.hidden_size, (v.patch_size, v.patch_size),
            strides=(v.patch_size, v.patch_size), use_bias=False,
            dtype=v.dtype, name="patch_embedding",
        )(pixels.astype(v.dtype))
        g = x.shape[1]
        x = x.reshape(b, g * g, v.hidden_size)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (g * g, v.hidden_size), jnp.float32)
        x = x + pos.astype(v.dtype)
        text_like = CLIPTextConfig(
            hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
            num_layers=v.num_layers, num_heads=v.num_heads,
            hidden_act=v.hidden_act, dtype=v.dtype,
        )
        mask = jnp.ones((g * g, g * g), bool)[None, None]
        for i in range(v.num_layers):
            x = CLIPEncoderLayer(text_like, name=f"layers_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=v.dtype, name="post_norm")(x)

        patch_emb = nn.Dense(cfg.embed_dim, use_bias=False, dtype=v.dtype, name="patch_proj")(x)
        _, _, text_pooled = CLIPTextModel(cfg.text, name="text_model")(text_ids)
        text_emb = nn.Dense(cfg.embed_dim, use_bias=False, dtype=v.dtype, name="text_proj")(
            text_pooled
        )

        # similarity logits per patch (normalized dot product, learned scale)
        pn = patch_emb / (jnp.linalg.norm(patch_emb, axis=-1, keepdims=True) + 1e-6)
        tn = text_emb / (jnp.linalg.norm(text_emb, axis=-1, keepdims=True) + 1e-6)
        scale = self.param("logit_scale", nn.initializers.constant(2.0), (), jnp.float32)
        logits = jnp.einsum("bpd,bd->bp", pn, tn) * jnp.exp(scale)
        scores = jax.nn.sigmoid(logits)[0]  # [P]

        # box regression per patch: offsets from the patch center (cxcywh)
        box_raw = nn.Dense(4, dtype=v.dtype, name="box_head")(x)[0]
        centers = (jnp.stack(
            jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="xy"), -1
        ).reshape(-1, 2) + 0.5) / g
        cxcy = jax.nn.sigmoid(box_raw[:, :2]) * 0.5 - 0.25 + centers
        wh = jax.nn.sigmoid(box_raw[:, 2:])
        boxes_xyxy = jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)
        boxes_xyxy = jnp.clip(boxes_xyxy, 0.0, 1.0)

        k = cfg.max_boxes
        top = jax.lax.top_k(scores, k)
        return boxes_xyxy[top[1]], top[0]
