"""Frozen cross-round numerics regression (VERDICT r04 item 6).

Each case runs a model stage at micro/tiny scale with fixed seeds and
compares activation statistics (mean / std / abs-max / 4 probe values)
against fixtures committed in ``tests/fixtures/regression_stats.json``.
Wall-clock benches wobble run to run; these statistics do not — any
change means the *numerics* of a stage drifted (an op rewrite, a dtype
change, an XLA default), which is exactly what r03→r04's unexplained
single-seed 15.22→15.44 s wobble could not distinguish from noise.

Regenerate deliberately after an intended numeric change:
``TWEEDIEMIX_REGEN_FIXTURES=1 python -m pytest tests/test_e2e_regression.py``
then commit the diff (it IS the reviewable numeric delta).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                            "regression_stats.json")
_REGEN = os.environ.get("TWEEDIEMIX_REGEN_FIXTURES", "0") == "1"


def _stats(x) -> dict:
    x = np.asarray(jax.device_get(x), np.float64).ravel()
    probes = x[:: max(1, len(x) // 4)][:4]
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
        "probes": [float(v) for v in probes],
    }


def _check(name: str, value) -> None:
    got = _stats(value)
    fixtures = {}
    if os.path.exists(FIXTURE_PATH):
        with open(FIXTURE_PATH) as f:
            fixtures = json.load(f)
    if _REGEN or name not in fixtures:
        fixtures[name] = got
        os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
        with open(FIXTURE_PATH, "w") as f:
            json.dump(fixtures, f, indent=1, sort_keys=True)
        if not _REGEN:
            pytest.skip(f"fixture {name!r} generated; commit and re-run")
        return
    ref = fixtures[name]
    for key in ("mean", "std", "absmax"):
        np.testing.assert_allclose(
            got[key], ref[key], rtol=2e-4, atol=1e-6,
            err_msg=f"{name}.{key} drifted (regen deliberately with "
                    f"TWEEDIEMIX_REGEN_FIXTURES=1 if intended)")
    np.testing.assert_allclose(got["probes"], ref["probes"], rtol=2e-4,
                               atol=1e-6, err_msg=f"{name}.probes drifted")


def test_unet2d_micro_forward_stats():
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.micro(concept_slots=3)
    model = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(7)
    hw = cfg.sample_size
    x = 0.4 * jax.random.normal(key, (2, hw, hw, 4))
    ctx = 0.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                  (2, 9, cfg.cross_attention_dim))
    pooled = 0.2 * jax.random.normal(jax.random.fold_in(key, 2),
                                     (2, cfg.pooled_projection_dim))
    tids = jnp.tile(jnp.asarray([[64.0, 64.0, 0, 0, 64.0, 64.0]]), (2, 1))
    idx = jnp.asarray([0, 2], jnp.int32)
    params = model.init(key, x, jnp.int32(5), ctx, pooled, tids, idx)["params"]
    eps = model.apply({"params": params}, x, jnp.int32(501), ctx, pooled,
                      tids, idx)
    _check("unet2d_micro_eps", eps)


def test_vae_tiny_roundtrip_stats():
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    key = jax.random.PRNGKey(11)
    img = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    params = vae.init(key, img, jax.random.fold_in(key, 1))["params"]
    mean, logvar = vae.apply({"params": params}, img, method=vae.encode)
    dec = vae.apply({"params": params}, mean, method=vae.decode)
    _check("vae_tiny_encode_mean", mean)
    _check("vae_tiny_decode", dec)


def test_clip_text_tiny_stats():
    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig.tiny(projection_dim=32)
    model = CLIPTextModel(cfg)
    ids = jnp.asarray([[49406, 320, 1125, 269, 49407] + [0] * 72], jnp.int32)
    params = model.init(jax.random.PRNGKey(13), ids)["params"]
    pen, final, pooled, pen_ln = model.apply({"params": params}, ids)
    _check("clip_text_tiny_final", final)
    _check("clip_text_tiny_pooled", pooled)


def test_unet3d_tiny_forward_stats():
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig.tiny()
    model = UNet3DConditionModel(cfg)
    key = jax.random.PRNGKey(17)
    b, f, hw = 1, 3, 16
    sample = 0.3 * jax.random.normal(key, (b, f, hw, hw, 4))
    ctx = 0.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                  (b, 6, cfg.cross_attention_dim))
    il = 0.3 * jax.random.normal(jax.random.fold_in(key, 2), (b, f, hw, hw, 4))
    emb = 0.2 * jax.random.normal(jax.random.fold_in(key, 3),
                                  (b, 1, cfg.cross_attention_dim))
    params = model.init(key, sample, jnp.int32(1), ctx, il, emb,
                        jnp.float32(8.0))["params"]
    eps = model.apply({"params": params}, sample, jnp.int32(301), ctx, il,
                      emb, jnp.float32(8.0), inject_copy=1.0)
    _check("unet3d_tiny_eps", eps)


def test_fusion_trajectory_micro_stats():
    """4-step micro trajectory through the REAL sampler + micro UNet:
    prologue resampling, joint step, masked fusion, Tweedie return — the
    closest fast proxy for the SMOKE pipeline's image stage."""
    from tweediemix_tpu.fusion.sampler import (
        FusionConfig,
        FusionSampler,
        TextEmbeds,
    )
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.schedulers.ddim import DDIMTable

    n = 2  # concepts incl. background
    cfg = UNetConfig.micro(concept_slots=n + 1)
    unet = UNet2DConditionModel(cfg)
    hw = cfg.sample_size
    fcfg = FusionConfig(n_timesteps=4, guidance_scale=0.8, t_cond=0.5,
                        resampling_steps=1, jumping_steps=1,
                        height=hw * 8, width=hw * 8, num_concepts=n)
    table = DDIMTable.create(n_steps=fcfg.n_timesteps)
    key = jax.random.PRNGKey(23)
    ctx_dim, pool = cfg.cross_attention_dim, cfg.pooled_projection_dim
    x2 = jnp.zeros((2, hw, hw, 4))
    c2 = jnp.zeros((2, 5, ctx_dim))
    p2 = jnp.zeros((2, pool))
    tids = jnp.asarray([[float(hw * 8), hw * 8, 0, 0, hw * 8, hw * 8]])
    params = unet.init(key, x2, jnp.int32(1), c2, p2,
                       jnp.tile(tids, (2, 1)), jnp.zeros((2,), jnp.int32))["params"]

    def unet_fn(p, x, t, ctx, pooled, idx, cross_kv=None):
        b = x.shape[0]
        return unet.apply({"params": p}, x, t, ctx, pooled,
                          jnp.tile(tids, (b, 1)), idx, cross_kv=cross_kv)

    def rows(k, m):
        return (0.2 * jax.random.normal(k, (m, 5, ctx_dim)),
                0.2 * jax.random.normal(jax.random.fold_in(k, 9), (m, pool)))

    jc, jp = rows(jax.random.fold_in(key, 1), 2)
    sc, sp = rows(jax.random.fold_in(key, 2), n - 1)
    cc, cp = rows(jax.random.fold_in(key, 3), n + 1)
    embeds = TextEmbeds(jc, jp, sc, sp, cc, cp)
    fg = (jnp.zeros((n - 1, fcfg.height, fcfg.width)).at[0, :, : fcfg.width // 2]
          .set(1.0))
    sampler = FusionSampler(table, fcfg, unet_fn, unet_params=params)
    x = sampler.run(embeds, jax.random.PRNGKey(3821), fg_masks=fg)
    _check("fusion_micro_trajectory", x)


def test_ddim_table_stats():
    from tweediemix_tpu.schedulers.ddim import DDIMTable

    table = DDIMTable.create(n_steps=50)
    _check("ddim_alphas_cumprod_50", table.alphas_cumprod)
