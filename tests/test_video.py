"""Video stage tests: UNet3D shapes and injection semantics, rotation-step
loop, position-ramp conditioning, and the run_video CLI end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.models.unet3d import (
    UNet3DConditionModel,
    UNet3DConfig,
    _inject_first_frame,
)
from tweediemix_tpu.video.pipeline import VideoConfig, VideoDDIM


def test_inject_first_frame_semantics():
    x = jnp.arange(2 * 4 * 2 * 2 * 3, dtype=jnp.float32).reshape(2, 4, 2, 2, 3)
    # identity when flags off
    np.testing.assert_allclose(np.asarray(_inject_first_frame(x, 0.0, 0.0, 0.7)), np.asarray(x))
    # hard copy: all frames equal frame 0
    c = _inject_first_frame(x, 1.0, 0.0, 0.7)
    for f in range(4):
        np.testing.assert_allclose(np.asarray(c[:, f]), np.asarray(x[:, 0]))
    # interp: frame 0 unchanged; others blended (utils_attn.py:445-455)
    r = _inject_first_frame(x, 0.0, 1.0, 0.7)
    np.testing.assert_allclose(np.asarray(r[:, 0]), np.asarray(x[:, 0]))
    want = 0.7 * np.asarray(x[:, :1]) + 0.3 * np.asarray(x[:, 1:])
    np.testing.assert_allclose(np.asarray(r[:, 1:]), want, rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_unet3d():
    cfg = UNet3DConfig.tiny()
    model = UNet3DConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    b, f, h, w = 1, 4, 8, 8
    sample = jax.random.normal(key, (b, f, h, w, 4))
    ctx = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (b, 6, cfg.cross_attention_dim))
    img_lat = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (b, f, h, w, 4))
    img_emb = 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (b, 1, cfg.cross_attention_dim))
    params = jax.jit(model.init)(
        key, sample, jnp.int32(1), ctx, img_lat, img_emb, jnp.float32(8.0)
    )["params"]
    return cfg, model, params, (sample, ctx, img_lat, img_emb)


def test_unet3d_forward(tiny_unet3d):
    cfg, model, params, (sample, ctx, img_lat, img_emb) = tiny_unet3d
    f = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    out = f(params, sample, jnp.int32(501), ctx, img_lat, img_emb, jnp.float32(8.0))
    assert out.shape == sample.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet3d_injection_flags_change_output(tiny_unet3d):
    cfg, model, params, (sample, ctx, img_lat, img_emb) = tiny_unet3d
    f = jax.jit(
        lambda p, ic, ii: model.apply(
            {"params": p}, sample, jnp.int32(501), ctx, img_lat, img_emb,
            jnp.float32(8.0), ic, ii, 0.7,
        )
    )
    base = f(params, jnp.float32(0), jnp.float32(0))
    copy = f(params, jnp.float32(1), jnp.float32(0))
    interp = f(params, jnp.float32(0), jnp.float32(1))
    assert float(jnp.max(jnp.abs(copy - base))) > 1e-6
    assert float(jnp.max(jnp.abs(interp - base))) > 1e-6


def test_unet3d_fps_conditioning(tiny_unet3d):
    cfg, model, params, (sample, ctx, img_lat, img_emb) = tiny_unet3d
    f = jax.jit(
        lambda p, fps: model.apply(
            {"params": p}, sample, jnp.int32(501), ctx, img_lat, img_emb, fps
        )
    )
    a = f(params, jnp.float32(8.0))
    b = f(params, jnp.float32(24.0))
    assert float(jnp.max(jnp.abs(a - b))) > 1e-6


def test_video_ddim_unshifted():
    cfg = VideoConfig(n_timesteps=10)
    tbl = VideoDDIM(cfg)
    ts = np.asarray(tbl.timesteps)
    assert ts[0] == 901 and ts[-1] == 1 and tbl.skip == 100
    # UNSHIFTED: alpha(1) = ā_1, not ā_0 (pipeline_i2vgen_xl.py:480-482)
    from tweediemix_tpu.schedulers.ddim import make_betas

    acp = np.cumprod(1.0 - make_betas())
    assert float(tbl.alpha(jnp.int32(1))) == pytest.approx(acp[1], rel=1e-6)
    assert float(tbl.alpha(jnp.int32(-99))) == pytest.approx(acp[0], rel=1e-6)


def test_position_ramp():
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from tweediemix_tpu.video.pipeline import I2VPipeline

    vcfg = VideoConfig(num_frames=4, height=64, width=64, n_timesteps=4)
    pipe = I2VPipeline.__new__(I2VPipeline)
    pipe.config = vcfg
    frame0 = jnp.full((1, 8, 8, 4), 2.0)
    lat = I2VPipeline.prepare_image_latents(pipe, frame0)
    assert lat.shape == (1, 4, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(lat[0, 0]), 2.0)
    # ramp: 1/3, 2/3, 3/3 (pipeline_i2vgen_xl.py:434-440)
    for i, scale in enumerate([1 / 3, 2 / 3, 1.0]):
        np.testing.assert_allclose(np.asarray(lat[0, i + 1]), scale, rtol=1e-6)


def test_run_video_cli_end_to_end(tmp_path):
    from PIL import Image

    from tweediemix_tpu.cli.run_video import main

    img = tmp_path / "first.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(img)
    out = tmp_path / "video.gif"
    rc = main([
        "--model_preset", "tiny",
        "--image", str(img),
        "--prompt", "a cat and a dog running",
        "--output", str(out),
        "--num_frames", "4",
        "--height", "64", "--width", "64",
        "--n_timesteps", "4",
    ])
    assert rc == 0
    gif = Image.open(out)
    assert gif.is_animated and gif.n_frames == 4
