"""Flax BERT encoder (GroundingDINO's text backbone).

The reference detector encodes captions with bert-base-uncased
(``text_segment/lang_sam/lang_sam.py:89-93`` via the GroundingDINO
checkpoint). Minimal faithful rebuild of HF ``BertModel``
(add_pooling_layer=False): learned word/position/token-type embeddings with
a post-embedding LayerNorm (eps 1e-12), post-norm transformer layers
(attention → residual+LN → GELU MLP → residual+LN). The attention mask is
GroundingDINO's *3-D block-diagonal* phrase mask (each "phrase. phrase."
segment only attends within itself), passed as a boolean [B, S, S].

Parity-tested against torch ``BertModel`` in tests/test_dino_parity.py.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @staticmethod
    def base(**kw) -> "BertConfig":
        return BertConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "BertConfig":
        defaults = dict(vocab_size=2000, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=64)
        defaults.update(kw)
        return BertConfig(**defaults)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, additive_mask):
        cfg = self.config
        h, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        b, s, _ = x.shape

        def split(t):
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        q = split(nn.Dense(cfg.hidden_size, name="query")(x))
        k = split(nn.Dense(cfg.hidden_size, name="key")(x))
        v = split(nn.Dense(cfg.hidden_size, name="value")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        if additive_mask is not None:
            scores = scores + additive_mask
        p = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        attn = nn.Dense(cfg.hidden_size, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")(x + attn)

        y = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden_size, name="output")(y)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_norm")(x + y)


class BertTextEncoder(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask_3d=None, token_type_ids=None,
                 position_ids=None):
        """input_ids [B, S] int; attention_mask_3d [B, S, S] bool (True =
        attend) or [B, S] padding mask; → last hidden state [B, S, hidden]."""
        cfg = self.config
        b, s = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s), (b, s))

        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
        x = word[input_ids] + pos[position_ids] + typ[token_type_ids]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)

        additive = None
        if attention_mask_3d is not None:
            m = attention_mask_3d
            if m.ndim == 2:  # plain padding mask → broadcast over queries
                m = m[:, None, :] & jnp.ones((1, s, 1), bool)
            additive = jnp.where(m[:, None, :, :], 0.0, jnp.finfo(jnp.float32).min)

        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, additive)
        return x
