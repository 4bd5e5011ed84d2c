"""Per-phase timing of the headline fusion trajectory on the real chip.

Times each jitted phase (prologue incl. resampling, joint scan, jumping,
fused scan, final VAE decode) separately, plus a single fused-step scan to
get ms/step, so perf work targets the dominant phase. Mirrors bench.py's
configuration (random weights; FLOPs identical to a real run).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fusion.py
       [--seeds N] [--trace DIR]
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3, warm=1):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--dump-hlo", type=str, default=None,
                    help="write the fused-scan compiled HLO text here")
    ap.add_argument("--fast", action="store_true",
                    help="only compile/measure the fused scan")
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()

    from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler, TextEmbeds
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.models.vae import (
        AutoencoderKL, VAEConfig, postprocess_image, unscale_latents)
    from tweediemix_tpu.schedulers.ddim import DDIMTable

    n_concepts = 3
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    # TWEEDIEMIX_BENCH_QUANT=int8 profiles the opt-in W8A8 mode (ops/quant.py)
    quant = os.environ.get("TWEEDIEMIX_BENCH_QUANT") or None
    if on_tpu:
        ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, concept_slots=n_concepts + 1,
                               quant=quant)
        vcfg = VAEConfig.sdxl()
        fcfg = FusionConfig(height=args.res, width=args.res, num_concepts=n_concepts)
        ctx_len, ctx_dim, pool_dim = 77, 2048, 1280
    else:
        ucfg = UNetConfig.micro(concept_slots=n_concepts + 1, quant=quant)
        vcfg = VAEConfig.tiny()
        fcfg = FusionConfig(n_timesteps=10, resampling_steps=2, jumping_steps=2,
                            height=128, width=128, num_concepts=n_concepts)
        ctx_len, ctx_dim, pool_dim = 16, ucfg.cross_attention_dim, ucfg.pooled_projection_dim

    table = DDIMTable.create(n_steps=fcfg.n_timesteps)
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)
    h, w = fcfg.latent_hw
    s = args.seeds

    def zeros_params(model, *a, dtype=None):
        shapes = jax.eval_shape(model.init, key, *a)["params"]
        return jax.tree.map(lambda sh: jnp.zeros(sh.shape, dtype or sh.dtype), shapes)

    uparams = zeros_params(
        unet, jnp.zeros((2, h, w, 4)), jnp.int32(1),
        jnp.zeros((2, ctx_len, ctx_dim)), jnp.zeros((2, pool_dim)),
        jnp.zeros((2, 6)), jnp.zeros((2,), jnp.int32),
        dtype=jnp.bfloat16 if on_tpu else None)
    vparams = zeros_params(vae, jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1))

    time_ids = jnp.array([[fcfg.height, fcfg.width, 0, 0, fcfg.height, fcfg.width]], jnp.float32)

    def unet_fn(params, x, t, ctx, pooled, idx, cross_kv=None):
        b = x.shape[0]
        return unet.apply({"params": params}, x, t, ctx, pooled,
                          jnp.tile(time_ids, (b, 1)), idx, cross_kv=cross_kv)

    from tweediemix_tpu.models.unet2d import precompute_cross_kv

    def kv_builder(params, ctx_rows, idx):
        return precompute_cross_kv(ucfg, params, ctx_rows, idx)

    def rows(k, n):
        return (0.1 * jax.random.normal(k, (n, ctx_len, ctx_dim)),
                0.1 * jax.random.normal(jax.random.fold_in(k, 9), (n, pool_dim)))

    jc, jp = rows(jax.random.fold_in(key, 1), 2)
    sc, sp = rows(jax.random.fold_in(key, 2), n_concepts - 1)
    cc, cp = rows(jax.random.fold_in(key, 3), n_concepts + 1)
    embeds = TextEmbeds(jc, jp, sc, sp, cc, cp)
    fg = (jnp.zeros((n_concepts - 1, fcfg.height, fcfg.width))
          .at[0, :, : fcfg.width // 2].set(1.0)
          .at[1, :, fcfg.width // 2 :].set(1.0))

    sampler = FusionSampler(table, fcfg, unet_fn, unet_params=uparams,
                            kv_builder=kv_builder)
    masks = sampler.compute_masks(None, fg)
    x = sampler.init_latent(key, num_seeds=s)

    decode = jax.jit(lambda vp, z: postprocess_image(
        vae.apply({"params": vp}, unscale_latents(z, vcfg), method=vae.decode)))

    ci, ne = fcfg.t_cond_idx, fcfg.n_timesteps

    if args.dump_hlo:
        compiled = sampler._jit_fused.lower(
            uparams, embeds, x, masks, start=ci, stop=ci + 4
        ).compile()
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print("HLO written to", args.dump_hlo)

    if args.fast:
        dt4 = timeit(lambda: sampler._jit_fused(
            uparams, embeds, x, masks, start=ci, stop=ci + 4), n=3, warm=1)
        dt8 = timeit(lambda: sampler._jit_fused(
            uparams, embeds, x, masks, start=ci, stop=ci + 8), n=3, warm=1)
        print(f"fused ms/step (batch {(n_concepts+1)*s} rows): "
              f"{(dt8-dt4)/4*1000:.1f}")
        if args.trace:
            with jax.profiler.trace(args.trace):
                jax.block_until_ready(sampler._jit_fused(
                    uparams, embeds, x, masks, start=ci, stop=ci + 4))
            print("trace written to", args.trace)
        return

    phases = {
        "prologue(1 step + %d resample)" % fcfg.resampling_steps:
            lambda: sampler._jit_prologue(uparams, embeds, x)[0],
        "joint_scan(%d steps)" % (ci - 1):
            lambda: sampler._jit_joint(uparams, embeds, x, start=1, stop=ci)[0],
        "jumping(%d fwd)" % fcfg.jumping_steps:
            lambda: sampler._jit_jumping(uparams, embeds, x),
        "fused_scan(%d steps)" % (ne - ci):
            lambda: sampler._jit_fused(uparams, embeds, x, masks, start=ci, stop=ne),
        "fused_scan(4 steps)":
            lambda: sampler._jit_fused(uparams, embeds, x, masks, start=ci, stop=ci + 4),
        "vae_decode_fp32":
            lambda: decode(vparams, x),
    }
    total = 0.0
    results = {}
    for name, fn in phases.items():
        dt = timeit(fn, n=2, warm=1)
        results[name] = dt
        print(f"{name:38s} {dt*1000:9.1f} ms")
    # derived: per-step costs
    n_fused = ne - ci
    full, four = results[f"fused_scan({n_fused} steps)"], results["fused_scan(4 steps)"]
    step_ms = (full - four) / (n_fused - 4) * 1000
    print(f"{'fused ms/step (batch %d rows)' % ((n_concepts+1)*s):38s} {step_ms:9.1f} ms")
    est = (results[f"prologue(1 step + {fcfg.resampling_steps} resample)"]
           + results[f"joint_scan({ci-1} steps)"]
           + results[f"jumping({fcfg.jumping_steps} fwd)"]
           + full + results["vae_decode_fp32"])
    print(f"{'estimated end-to-end':38s} {est:9.3f} s  ({s} seed(s))")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(
                sampler._jit_fused(uparams, embeds, x, masks, start=ci, stop=ci + 4))
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
