"""Flax CLIP text encoders (dual SDXL pair) with modifier-token surgery.

The reference uses HF ``CLIPTextModel`` (ViT-L/14) and
``CLIPTextModelWithProjection`` (OpenCLIP bigG) and takes, for each prompt,
the *penultimate* hidden state of both encoders concatenated on the feature
axis plus the pooled projected embedding of the second encoder
(``fusion_generation/fusion_sampling.py:43-68``). Modifier tokens are
appended to both tokenizers and their embedding rows overwritten from the
concept checkpoint (``fusion_sampling.py:159-190``; training-side init at
``concept_training/diffusers_training_xl_new.py:800-858``).

Here both encoders are first-class Flax modules (no transformers
dependency), and "resize token embeddings + set rows" is a pure function on
the param pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


# CLIP image-preprocessing statistics (CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: Optional[int] = None
    eos_token_id: int = 49407
    dtype: jnp.dtype = jnp.float32
    # rematerialize encoder layers in backward — needed to fit
    # --train_text_encoder (full-tower grads) in one chip's HBM
    remat: bool = False

    @staticmethod
    def sdxl_text_encoder(**kw) -> "CLIPTextConfig":
        """CLIP ViT-L/14 text tower (SDXL text_encoder)."""
        return CLIPTextConfig(**kw)

    @staticmethod
    def sdxl_text_encoder_2(**kw) -> "CLIPTextConfig":
        """OpenCLIP bigG text tower (SDXL text_encoder_2, with projection)."""
        defaults = dict(
            hidden_size=1280, intermediate_size=5120, num_layers=32,
            num_heads=20, hidden_act="gelu", projection_dim=1280,
        )
        defaults.update(kw)
        return CLIPTextConfig(**defaults)

    @staticmethod
    def i2vgen_text_encoder(**kw) -> "CLIPTextConfig":
        """OpenCLIP ViT-H/14 text tower (ali-vilab/i2vgen-xl text_encoder)."""
        defaults = dict(
            hidden_size=1024, intermediate_size=4096, num_layers=24,
            num_heads=16, hidden_act="gelu",
        )
        defaults.update(kw)
        return CLIPTextConfig(**defaults)

    @staticmethod
    def tiny(**kw) -> "CLIPTextConfig":
        defaults = dict(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_positions=77, eos_token_id=999,
        )
        defaults.update(kw)
        return CLIPTextConfig(**defaults)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size
        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm1")(x)
        q = nn.Dense(d, dtype=cfg.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=cfg.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=cfg.dtype, name="v_proj")(h)
        b, t, _ = q.shape
        hd = d // cfg.num_heads
        split = lambda a: a.reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum(
            "bhid,bhjd->bhij", split(q), split(k), preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        s = jnp.where(causal_mask, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", p, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=cfg.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(d, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (penultimate_hidden, final_hidden, pooled, penultimate_ln).

    ``penultimate_hidden`` is the layer-(N-1) output without the final
    LayerNorm — exactly HF's ``hidden_states[-2]`` used by SDXL.
    ``pooled`` is the final-LN hidden at the EOS position, projected when
    ``projection_dim`` is set (the CLIPTextModelWithProjection behavior).
    ``penultimate_ln`` is ``final_layer_norm(hidden_states[-2])`` — the
    ``clip_skip=1`` prompt embedding the I2VGen-XL pipeline defaults to
    (``video_gen/pipeline_i2vgen_xl.py:505,202-217,268-282``).
    """

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="token_embedding")
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
            jnp.float32,
        )
        x = tok(input_ids) + pos[:t].astype(cfg.dtype)

        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        layer_cls = nn.remat(CLIPEncoderLayer) if cfg.remat else CLIPEncoderLayer
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = layer_cls(cfg, name=f"layers_{i}")(x, mask)
        ln_final = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="final_layer_norm")
        final = ln_final(x)
        penultimate_ln = ln_final(penultimate)

        # EOS pooling: first position equal to eos_token_id (HF convention)
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=1)
        pooled = final[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=cfg.dtype, name="text_projection"
            )(pooled)
        return penultimate, final, pooled, penultimate_ln


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    hidden_act: str = "quick_gelu"
    projection_dim: Optional[int] = 1024
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def vit_h(**kw) -> "CLIPVisionConfig":
        """OpenCLIP ViT-H/14 image tower (ali-vilab/i2vgen-xl image_encoder)."""
        defaults = dict(hidden_size=1280, intermediate_size=5120,
                        num_layers=32, num_heads=16, patch_size=14,
                        hidden_act="gelu", projection_dim=1024)
        defaults.update(kw)
        return CLIPVisionConfig(**defaults)

    @staticmethod
    def tiny(**kw) -> "CLIPVisionConfig":
        defaults = dict(image_size=32, patch_size=8, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=2,
                        projection_dim=32)
        defaults.update(kw)
        return CLIPVisionConfig(**defaults)


class CLIPVisionModel(nn.Module):
    """CLIP image tower → projected image embedding.

    Used for the I2VGen-XL image conditioning
    (``video_gen/pipeline_i2vgen_xl.py:300-330``): class-token pooled output
    through ``visual_projection`` gives ``image_embeds``.
    Input: [B, H, W, 3] normalized with CLIP stats.
    """

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
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
        x = jnp.concatenate([jnp.tile(cls_tok[None, None], (b, 1, 1)).astype(cfg.dtype), x], axis=1)
        n_pos = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_pos, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="pre_layrnorm")(x)
        mask = jnp.ones((x.shape[1], x.shape[1]), bool)[None, None]  # non-causal
        text_like = CLIPTextConfig(
            hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            hidden_act=cfg.hidden_act, dtype=cfg.dtype,
        )
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(text_like, name=f"layers_{i}")(x, mask)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="post_layernorm")(x[:, 0])
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                              name="visual_projection")(pooled)
        return pooled


# ---------------------------------------------------------------------------
# modifier-token embedding surgery (pure param-tree functions)


def resize_token_embeddings(params, new_vocab_size: int, rng=None):
    """Grow the token-embedding table (new rows ~ N(0, 0.01) or zeros)."""
    flat = dict(traverse_util.flatten_dict(params))
    key = ("token_embedding", "embedding")
    emb = np.asarray(flat[key])
    old, d = emb.shape
    # a table that is already large enough (e.g. a --train_text_encoder
    # tower whose saved table includes its modifier rows) is left as-is
    if new_vocab_size > old:
        if rng is not None:
            extra = 0.01 * np.asarray(
                jax.random.normal(rng, (new_vocab_size - old, d), dtype=jnp.float32)
            )
        else:
            extra = np.zeros((new_vocab_size - old, d), emb.dtype)
        flat[key] = jnp.asarray(np.concatenate([emb, extra.astype(emb.dtype)], axis=0))
    return traverse_util.unflatten_dict(flat)


def set_token_embedding_rows(params, rows: dict):
    """Overwrite embedding rows {token_id: vector} (fusion_sampling.py:185-190)."""
    flat = dict(traverse_util.flatten_dict(params))
    key = ("token_embedding", "embedding")
    emb = np.array(flat[key])
    for tid, vec in rows.items():
        emb[int(tid)] = np.asarray(vec, emb.dtype)
    flat[key] = jnp.asarray(emb)
    return traverse_util.unflatten_dict(flat)


def nearest_tokens(embed, embedding_table, top_k: int = 1):
    """Dot-score nearest vocabulary rows for an embedding — the ``find_disc``
    debug probe (fusion_sampling.py:244-264 /
    diffusers_model_pipeline_xl_new.py:281-314, sans sentence-transformers).
    Returns (ids [top_k], scores [top_k])."""
    scores = jnp.asarray(embedding_table, jnp.float32) @ jnp.asarray(embed, jnp.float32)
    top = jax.lax.top_k(scores, top_k)
    return top[1], top[0]


# ---------------------------------------------------------------------------
# dual-encoder SDXL text stack


class DualTextEncoder:
    """SDXL prompt encoding: concat penultimate hiddens of both towers on
    the feature axis + pooled projection of tower 2
    (``fusion_sampling.py:43-68``)."""

    def __init__(self, cfg1: CLIPTextConfig, cfg2: CLIPTextConfig, params1, params2):
        self.model1 = CLIPTextModel(cfg1)
        self.model2 = CLIPTextModel(cfg2)
        self.params1 = params1
        self.params2 = params2
        self._encode = jax.jit(self._encode_impl)

    @classmethod
    def random_init(cls, cfg1, cfg2, key, seq_len=77):
        ids = jnp.zeros((1, seq_len), jnp.int32)
        p1 = jax.jit(CLIPTextModel(cfg1).init)(key, ids)["params"]
        p2 = jax.jit(CLIPTextModel(cfg2).init)(jax.random.fold_in(key, 1), ids)["params"]
        return cls(cfg1, cfg2, p1, p2)

    def _encode_impl(self, params1, params2, ids1, ids2):
        pen1 = self.model1.apply({"params": params1}, ids1)[0]
        pen2, _, pooled2, _ = self.model2.apply({"params": params2}, ids2)
        ctx = jnp.concatenate([pen1, pen2], axis=-1)
        return ctx, pooled2

    def encode_ids(self, ids1: jnp.ndarray, ids2: jnp.ndarray):
        """[B,77] token ids per tokenizer → (ctx [B,77,d1+d2], pooled [B,proj2])."""
        return self._encode(self.params1, self.params2, ids1, ids2)

    def load_tower_state(self, params1=None, params2=None):
        """Replace whole tower param trees — the ``--train_text_encoder``
        checkpoint's ``text_encoder``/``text_encoder_2`` entries
        (reference ``load_model``:
        ``diffusers_model_pipeline_xl_new.py:327-328`` does
        ``load_state_dict`` on tower 1). Rebuilds each model at the loaded
        vocab size (the saved table may already contain modifier rows)."""
        for attr_p, attr_m, params in (
            ("params1", "model1", params1), ("params2", "model2", params2)
        ):
            if params is None:
                continue
            setattr(self, attr_p, params)
            vocab = traverse_util.flatten_dict(params)[
                ("token_embedding", "embedding")].shape[0]
            model = getattr(self, attr_m)
            setattr(self, attr_m, CLIPTextModel(
                dataclasses.replace(model.config, vocab_size=vocab)))
        self._encode = jax.jit(self._encode_impl)

    def add_modifier_tokens(self, token_ids_1, embeds_1, token_ids_2, embeds_2):
        """Resize both towers' embedding tables and set the modifier rows.

        Rebuilds the models with the grown vocab size (flax validates param
        shapes against the module config at apply time)."""
        new_size_1 = max(self.model1.config.vocab_size, max(token_ids_1) + 1)
        new_size_2 = max(self.model2.config.vocab_size, max(token_ids_2) + 1)
        self.params1 = set_token_embedding_rows(
            resize_token_embeddings(self.params1, new_size_1),
            dict(zip(token_ids_1, embeds_1)),
        )
        self.params2 = set_token_embedding_rows(
            resize_token_embeddings(self.params2, new_size_2),
            dict(zip(token_ids_2, embeds_2)),
        )
        self.model1 = CLIPTextModel(dataclasses.replace(self.model1.config, vocab_size=new_size_1))
        self.model2 = CLIPTextModel(dataclasses.replace(self.model2.config, vocab_size=new_size_2))
        # embedding tables changed shape; re-jit
        self._encode = jax.jit(self._encode_impl)
