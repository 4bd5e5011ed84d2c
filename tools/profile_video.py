"""Per-stage timing of the video clip trajectory on the real chip.

Decomposes tools/bench_video.py's end-to-end clip time into conditioning
(CLIP-side inputs are synthetic here), the jitted 50-step denoising scan,
and the chunked VAE decode at several chunk sizes, so video perf work
targets the dominant stage. Mirrors bench_video's configuration (random
weights; FLOPs identical to a real run).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_video.py
       [--trace DIR] [--chunks 1,2,4,8,16]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # host fetch: the reliable barrier on the tunneled backend
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def timeit(fn, *args, n=2, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace of one denoise loop here")
    ap.add_argument("--chunks", type=str, default="1,4,16")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tiny config smoke test)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.video.pipeline import I2VPipeline, VideoConfig

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    # TWEEDIEMIX_BENCH_QUANT=int8 profiles the opt-in W8A8 mode (ops/quant.py)
    import os as _os
    quant = _os.environ.get("TWEEDIEMIX_BENCH_QUANT") or None
    if on_tpu:
        ucfg = UNet3DConfig.i2vgen(dtype=jnp.bfloat16, quant=quant)
        vcfg = VAEConfig(scaling_factor=0.18215)
        vid = VideoConfig()
        ctx_len = 77
    else:
        ucfg = UNet3DConfig.tiny(quant=quant)
        vcfg = VAEConfig.tiny()
        vid = VideoConfig(n_timesteps=4, num_frames=4, height=32, width=32,
                          latent_factor=2)
        ctx_len = 8

    key = jax.random.PRNGKey(0)
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    f = vid.num_frames
    h, w = vid.latent_hw

    def zeros_params(model, *a):
        shapes = jax.eval_shape(model.init, key, *a)["params"]
        dt = jnp.bfloat16 if on_tpu else None
        # single jitted pytree build — per-leaf jnp.zeros costs one remote
        # compile round trip per leaf on the tunneled backend (docs/PERF.md
        # round 5 bench-wall anatomy)
        return jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, dt or s.dtype), shapes))()

    uparams = zeros_params(
        unet, jnp.zeros((2, f, h, w, 4)), jnp.int32(1),
        jnp.zeros((2, ctx_len, ucfg.cross_attention_dim)),
        jnp.zeros((2, f, h, w, 4)),
        jnp.zeros((2, 1, ucfg.cross_attention_dim)),
        jnp.float32(8.0),
    )
    _vshapes = jax.eval_shape(vae.init, key, jnp.zeros((1, 32, 32, 3)),
                              jax.random.PRNGKey(1))["params"]
    vparams = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), _vshapes))()

    pipe = I2VPipeline(vid, unet, uparams, vae, vparams)
    ctx = 0.1 * jax.random.normal(key, (2, ctx_len, ucfg.cross_attention_dim))
    img_lat2 = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (2, f, h, w, 4))
    img_emb2 = 0.1 * jax.random.normal(jax.random.fold_in(key, 2),
                                       (2, 1, ucfg.cross_attention_dim))
    fps2 = jnp.full((2,), float(vid.fps), jnp.float32)
    x0 = jax.random.normal(jax.random.fold_in(key, 3), (1, f, h, w, 4))

    # denoising scan alone (CFG pair per step, cache hoisted)
    dt_loop = timeit(pipe._jit_loop, pipe.unet_params, x0, ctx, img_lat2,
                     img_emb2, fps2)
    print(f"denoise loop ({vid.n_timesteps} steps): {dt_loop:.2f} s "
          f"({1000 * dt_loop / vid.n_timesteps:.1f} ms/step)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            sync(pipe._jit_loop(pipe.unet_params, x0, ctx, img_lat2, img_emb2,
                                fps2))
        print("trace written to", args.trace)

    # decode at several chunk sizes
    lat = 0.2 * jax.random.normal(jax.random.fold_in(key, 4), (1, f, h, w, 4))
    import dataclasses

    for c in [int(s) for s in args.chunks.split(",")]:
        cfgc = dataclasses.replace(vid, decode_chunk_size=c)
        pipec = I2VPipeline(cfgc, unet, uparams, vae, vparams)
        decode = jax.jit(pipec.decode_video)
        dt = timeit(decode, lat)
        print(f"decode chunk={c}: {dt:.2f} s")


if __name__ == "__main__":
    main()
