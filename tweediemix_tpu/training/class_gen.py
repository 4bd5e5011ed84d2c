"""Class/regularization image generation for prior preservation.

The reference generates ``num_class_images`` samples of the class prompt
with the base SDXL pipeline when the class dir is empty
(``concept_training/diffusers_training_xl_new.py:561-600``, 50 steps,
standard CFG). Here: a plain text2img DDIM loop (guided-eps renoising —
the standard eta=0 step, unlike the fusion sampler's uncond-eps rule) as a
jitted scan, batched over seeds.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.schedulers.ddim import DDIMTable, cfg as cfg_combine


def text2img_scan(table: DDIMTable, unet_fn, params, ctx2, pooled2, x,
                  guidance_scale: float):
    """Standard CFG DDIM sampling. ctx2/pooled2 rows = [uncond, cond];
    x [S, h, w, 4]. Returns final x0 [S, h, w, 4]."""
    s = x.shape[0]
    n_steps = table.n_steps
    is_final = jnp.arange(n_steps) == (n_steps - 1)

    def step(x, inp):
        t, final = inp
        xin = jnp.concatenate([x, x], axis=0)
        eps = unet_fn(
            params, xin, t,
            jnp.repeat(ctx2, s, axis=0), jnp.repeat(pooled2, s, axis=0),
            jnp.zeros((2 * s,), jnp.int32),
        )
        e = cfg_combine(eps[:s], eps[s:], guidance_scale)
        at = table.alpha(t)
        x0 = table.tweedie(x, e, at)
        x_next = table.renoise(x0, e, table.alpha(t - table.skip))
        return jnp.where(final, x0, x_next), None

    x, _ = jax.lax.scan(step, x, (table.timesteps, is_final))
    return x


def generate_class_images(
    out_dir: str,
    num_images: int,
    prompt_ctx2,
    prompt_pooled2,
    unet_fn,
    unet_params,
    decode_fn,
    latent_hw,
    n_steps: int = 50,
    guidance_scale: float = 6.0,
    batch: int = 4,
    seed: int = 0,
) -> int:
    """Writes ``{i:05d}.png`` into out_dir; returns count (reference
    :561-600 writes hash-named jpgs; the dataset globs either)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    table = DDIMTable.create(n_steps=n_steps)
    h, w = latent_hw
    loop = jax.jit(
        lambda p, x: text2img_scan(table, unet_fn, p, prompt_ctx2, prompt_pooled2,
                                   x, guidance_scale)
    )
    written = 0
    key = jax.random.PRNGKey(seed)
    while written < num_images:
        n = min(batch, num_images - written)
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (n, h, w, 4), jnp.float32)
        x0 = loop(unet_params, x)
        imgs = decode_fn(x0)  # [n, H, W, 3] in [0,1]
        for i in range(n):
            arr = np.asarray(imgs[i] * 255.0, np.uint8)
            Image.fromarray(arr).save(os.path.join(out_dir, f"{written + i:05d}.png"))
        written += n
    return written
