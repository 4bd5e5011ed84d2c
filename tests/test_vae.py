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


def test_latents_mean_std_denormalization():
    """Final decode with configured latents_mean/latents_std must match the
    reference expression ``x * std / scaling_factor + mean``
    (fusion_sampling.py:505-518), mirrored here in numpy; the preview path
    keeps the plain 1/0.18215 scale (fusion_sampling.py:297-303)."""
    mean = (0.1, -0.2, 0.3, -0.4)
    std = (0.9, 1.1, 0.8, 1.2)
    cfg = VAEConfig.sdxl(latents_mean=mean, latents_std=std)
    z = np.random.RandomState(0).randn(2, 4, 4, 4).astype(np.float32)

    got = np.asarray(unscale_latents(jnp.asarray(z), cfg))
    want = z * np.asarray(std, np.float32) / cfg.scaling_factor + np.asarray(
        mean, np.float32
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # preview decode ignores the statistics, like the reference's
    # decode_latent helper
    np.testing.assert_allclose(
        np.asarray(unscale_latents(jnp.asarray(z), cfg, preview=True)),
        z / 0.18215,
        rtol=1e-6,
    )

    # without the statistics the plain 1/scaling_factor path is unchanged
    plain = VAEConfig.sdxl()
    np.testing.assert_allclose(
        np.asarray(unscale_latents(jnp.asarray(z), plain)),
        z / plain.scaling_factor,
        rtol=1e-6,
    )


def test_vae_config_overrides_reads_checkpoint_config(tmp_path):
    """vae_config_overrides picks up scaling_factor + latents_mean/std from a
    checkpoint's HF config.json and is empty when the file (or the optional
    statistics) are absent."""
    import json

    from tweediemix_tpu.models.convert import vae_config_overrides

    # no config.json -> no overrides
    assert vae_config_overrides(str(tmp_path)) == {}

    # config with statistics (e.g. playground-style VAEs)
    (tmp_path / "config.json").write_text(
        json.dumps(
            {
                "scaling_factor": 0.5,
                "latents_mean": [0.1, 0.2, 0.3, 0.4],
                "latents_std": [1.0, 1.1, 1.2, 1.3],
            }
        )
    )
    out = vae_config_overrides(str(tmp_path))
    assert out["scaling_factor"] == 0.5
    assert out["latents_mean"] == (0.1, 0.2, 0.3, 0.4)
    assert out["latents_std"] == (1.0, 1.1, 1.2, 1.3)
    cfg = VAEConfig.sdxl(**out)
    assert cfg.latents_std == (1.0, 1.1, 1.2, 1.3)

    # default fp16-fix style config: scaling factor only, mean/std absent
    (tmp_path / "config.json").write_text(json.dumps({"scaling_factor": 0.13025}))
    out = vae_config_overrides(str(tmp_path))
    assert out == {"scaling_factor": 0.13025}


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
