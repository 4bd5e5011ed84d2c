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


def test_unet3d_precomputed_cache_matches_full_forward(tiny_unet3d):
    """precompute_video_cache (hoisted ctx/il/cross-KV) must be a pure
    refactor of the per-step forward: identical eps for identical inputs."""
    from tweediemix_tpu.models.unet3d import precompute_video_cache

    cfg, model, params, (sample, ctx, img_lat, img_emb) = tiny_unet3d
    fps = jnp.float32(8.0)
    t = jnp.int32(501)
    full = model.apply({"params": params}, sample, t, ctx, img_lat, img_emb,
                       fps, 0.3, 0.4, 0.7)
    cached_ctx, cached_il, cross_kv = precompute_video_cache(
        model, params, ctx, img_lat, img_emb, fps)
    cached = model.apply({"params": params}, sample, t, ctx, img_lat, img_emb,
                         fps, 0.3, 0.4, 0.7, cached_ctx=cached_ctx,
                         cached_il=cached_il, cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_decode_chunk_size_invariance():
    """decode_video must give identical pixels at any decode_chunk_size
    (incl. a non-divisor request, which rounds down to a divisor)."""
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.video.pipeline import I2VPipeline

    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)
    vparams = vae.init(key, jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(1))["params"]
    lat = 0.3 * jax.random.normal(key, (1, 4, 8, 8, 4))

    outs = []
    for chunk in (1, 2, 3, 4):
        cfg = VideoConfig(num_frames=4, height=16, width=16, latent_factor=2,
                          decode_chunk_size=chunk)
        pipe = I2VPipeline(cfg, None, None, vae, vparams)
        outs.append(np.asarray(pipe.decode_video(lat)))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-5, atol=1e-6)


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


def test_convert_unet3d_roundtrip_tiny():
    """Synthesize a diffusers I2VGenXLUNet-style state dict for the tiny
    config and check the converted tree covers the flax init tree exactly
    (the ali-vilab/i2vgen-xl conversion path at tiny scale)."""
    import re

    from flax import traverse_util

    from tweediemix_tpu.models.convert import convert_unet3d_state_dict

    cfg = UNet3DConfig.tiny()
    model = UNet3DConditionModel(cfg)
    b, f, h, w = 1, 2, 8, 8
    args = (
        jnp.zeros((b, f, h, w, 4)), jnp.int32(1),
        jnp.zeros((b, 6, cfg.cross_attention_dim)),
        jnp.zeros((b, f, h, w, 4)),
        jnp.zeros((b, 1, cfg.cross_attention_dim)),
        jnp.float32(8.0),
    )
    want = traverse_util.flatten_dict(
        jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)["params"]
    )

    rng = np.random.RandomState(0)
    top_inv = {
        "image_latents_proj_in_conv1": "image_latents_proj_in.0",
        "image_latents_proj_in_conv2": "image_latents_proj_in.2",
        "image_latents_proj_in_conv3": "image_latents_proj_in.4",
        "image_latents_context_embedding_conv1": "image_latents_context_embedding.0",
        "image_latents_context_embedding_conv2": "image_latents_context_embedding.3",
        "image_latents_context_embedding_conv3": "image_latents_context_embedding.5",
    }

    def inv_top(top):
        m = re.match(r"(down_blocks|up_blocks)_(\d+)_([a-z_]+)_(\d+)$", top)
        if m:
            return f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}"
        m = re.match(r"mid_block_([a-z_]+)_(\d+)$", top)
        if m:
            return f"mid_block.{m.group(1)}.{m.group(2)}"
        return top_inv.get(top, top)

    sd = {}
    for path, leafshape in want.items():
        shape = leafshape.shape
        mod, leaf = list(path[:-1]), path[-1]
        top = mod[0]
        mod[0] = inv_top(top)
        name = ".".join(mod)
        name = name.replace("transformer_blocks_0", "transformer_blocks.0")
        name = name.replace("net_0_proj", "net.0.proj").replace("net_2", "net.2")
        name = name.replace("to_out_0", "to_out.0")
        # HF uses nn.Sequential indices for these two MLPs
        name = name.replace("context_embedding.linear_1", "context_embedding.0")
        name = name.replace("context_embedding.linear_2", "context_embedding.2")
        name = name.replace("fps_embedding.linear_1", "fps_embedding.0")
        name = name.replace("fps_embedding.linear_2", "fps_embedding.2")
        if "temp_convs" in name:
            name = re.sub(r"norm(\d)$", r"conv\1.0", name)
            name = re.sub(
                r"conv(\d)$",
                lambda mm: f"conv{mm.group(1)}." + ("2" if mm.group(1) == "1" else "3"),
                name,
            )

        spatial_attn = ("attentions" in top and "temp_attentions" not in top)
        if leaf == "kernel":
            tleaf = "weight"
            if len(shape) == 5:  # temporal conv [3,1,1,I,O] → Conv3d [O,I,3,1,1]
                arr = rng.randn(shape[4], shape[3], shape[0], shape[1], shape[2])
            elif len(shape) == 4:  # spatial conv [kh,kw,I,O] → [O,I,kh,kw]
                arr = rng.randn(shape[3], shape[2], shape[0], shape[1])
            elif spatial_attn and path[-2] in ("proj_in", "proj_out"):
                # upstream use_linear_projection=False: 1x1 conv
                arr = rng.randn(shape[1], shape[0], 1, 1)
            else:  # linear
                arr = rng.randn(shape[1], shape[0])
        elif leaf == "scale":
            tleaf = "weight"
            arr = rng.randn(*shape)
        else:
            tleaf = leaf
            arr = rng.randn(*shape)
        sd[f"{name}.{tleaf}"] = arr.astype(np.float32)

    got = traverse_util.flatten_dict(convert_unet3d_state_dict(sd))
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), p
    # converted params must actually run
    out = model.apply({"params": traverse_util.unflatten_dict(got)}, *args)
    assert out.shape == (b, f, h, w, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


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


def test_batched_clips_match_single_runs():
    """Clip rows of one batched generate() == independent runs (the
    "seeds in parallel" serving layout applied to the video stage)."""
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.video.pipeline import I2VPipeline

    vcfg = VideoConfig(num_frames=2, height=32, width=32, n_timesteps=3,
                       latent_factor=2)
    ucfg = UNet3DConfig.tiny()
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(VAEConfig.tiny())
    key = jax.random.PRNGKey(0)
    h, w = vcfg.latent_hw
    uparams = jax.jit(unet.init)(
        key, jnp.zeros((2, vcfg.num_frames, h, w, 4)), jnp.int32(1),
        jnp.zeros((2, 8, ucfg.cross_attention_dim)),
        jnp.zeros((2, vcfg.num_frames, h, w, 4)),
        jnp.zeros((2, 1, ucfg.cross_attention_dim)),
        jnp.full((2,), 8.0), jnp.float32(1), jnp.float32(1), 0.7,
    )["params"]
    vparams = jax.jit(vae.init)(
        jax.random.fold_in(key, 1), jnp.zeros((1, 32, 32, 3)),
        jax.random.PRNGKey(1),
    )["params"]
    pipe = I2VPipeline(vcfg, unet, uparams, vae, vparams)

    ctx = 0.1 * jax.random.normal(key, (2, 8, ucfg.cross_attention_dim))
    uctx = jnp.zeros((1, 8, ucfg.cross_attention_dim))
    imgs = jax.random.uniform(jax.random.fold_in(key, 2), (2, 32, 32, 3)) * 2 - 1
    emb = 0.1 * jax.random.normal(jax.random.fold_in(key, 3),
                                  (2, 1, ucfg.cross_attention_dim))

    batched = pipe.generate(ctx, uctx, imgs, emb, seed=5)
    assert batched.shape[0] == 2
    # clip 0 of the batch reproduces the single-clip path bit-for-bit
    single0 = pipe.generate(ctx[:1], uctx, imgs[:1], emb[:1], seed=5)
    np.testing.assert_allclose(
        np.asarray(batched[0]), np.asarray(single0), atol=2e-5, rtol=1e-5
    )
    # and clip 1 reproduces at a different batch size (3-clip run, rows
    # 1/2 duplicated): both the init latents AND the VAE posterior noise
    # are per-row keyed, so no clip's stream depends on the batch size
    ctx3 = jnp.concatenate([ctx, ctx[1:]], 0)
    imgs3 = jnp.concatenate([imgs, imgs[1:]], 0)
    emb3 = jnp.concatenate([emb, emb[1:]], 0)
    batched3 = pipe.generate(ctx3, uctx, imgs3, emb3, seed=5)
    np.testing.assert_allclose(
        np.asarray(batched3[1]), np.asarray(batched[1]), atol=2e-5, rtol=1e-5
    )
