"""VAE unit tests: encode/decode shape roundtrip, the SDXL scaling factor,
and the reference's 1/0.18215 Tweedie-preview decode quirk
(fusion_sampling.py:300 vs the SDXL 0.13025 final-decode scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    postprocess_image,
    scale_latents,
    unscale_latents,
)


def test_scaling_quirk():
    cfg = VAEConfig.sdxl()
    z = jnp.ones((1, 4, 4, 4))
    # training/final path: multiply by 0.13025 on encode, divide on decode
    np.testing.assert_allclose(np.asarray(scale_latents(z, cfg)), 0.13025)
    np.testing.assert_allclose(
        np.asarray(unscale_latents(scale_latents(z, cfg), cfg)), 1.0, rtol=1e-6
    )
    # preview path: the reference divides by 0.18215 regardless of the
    # SDXL factor (fusion_sampling.py:300)
    np.testing.assert_allclose(
        np.asarray(unscale_latents(z, cfg, preview=True)), 1.0 / 0.18215, rtol=1e-6
    )


def test_encode_decode_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    params = jax.jit(vae.init)(key, img, jax.random.PRNGKey(1))["params"]

    mean, logvar = vae.apply({"params": params}, img, method=vae.encode)
    factor = 2 ** (len(cfg.block_out_channels) - 1)
    assert mean.shape == (1, 32 // factor, 32 // factor, 4)
    assert logvar.shape == mean.shape
    assert bool(jnp.isfinite(mean).all()) and bool(jnp.isfinite(logvar).all())

    out = vae.apply({"params": params}, mean, method=vae.decode)
    assert out.shape == img.shape

    post = postprocess_image(out)
    assert float(post.min()) >= 0.0 and float(post.max()) <= 1.0
