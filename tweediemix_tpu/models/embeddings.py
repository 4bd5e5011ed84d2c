"""Sinusoidal timestep / size-condition embeddings (diffusers conventions).

SDXL conditions the UNet on (a) the diffusion timestep and (b) the six
``add_time_ids`` (original size, crop top-left, target size) built at
``fusion_generation/fusion_sampling.py:70-78``, each Fourier-embedded with
``flip_sin_to_cos=True, downscale_freq_shift=0`` and pushed through a
2-layer SiLU MLP.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def timestep_embedding(
    t: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """t: [...] → [..., dim] sinusoidal features (fp32)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 → SiLU → linear_2 MLP over Fourier features."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
