#!/usr/bin/env python
"""Headline benchmark: 2-concept (cat+dog+background, N=3) 1024x1024 SDXL
fusion sample, 50 DDIM steps with the reference's default flags
(resampling 10, jumping 5 — sample_catdog.sh:33-36), full sampling loop
plus final fp32 VAE decode, measured steady-state on one chip.

Prints ONE JSON line. The headline is BASELINE.json's tracked metric —
images/min/chip at the 4-seed serving batch — with vs_baseline measured
against the 60/32 = 1.875 images/min/chip rate the <4 s v5e-8 north star
implies (32 chip-seconds per image); single-seed latency rides along as
"single_seed_s_per_image". Both ratio framings are emitted
(vs_baseline_latency = 4 s / single-seed s; vs_baseline_throughput =
rate / 1.875). Riders, in budget order:

* segmentation (BASELINE config 3's in-loop masks; tools/bench_segment.py)
  as seg_ms_per_concept,
* video (BASELINE config 4; tools/bench_video.py) as video_clip_s /
  video_frames_per_s / video_vs_baseline (240 chip-s budget / measured),
* the non-headline serving mode at single-seed (bf16 when the headline is
  the default int8-static W8A8, int8 when TWEEDIEMIX_BENCH_QUANT=bf16) —
  OPT-IN via TWEEDIEMIX_BENCH_BF16/INT8=1 since round 5: even cache-warm,
  a second trajectory's executables cost ~250-300 s to load through the
  tunneled backend, which pushed the all-stage wall past the 1500 s
  driver budget; the A/B matrix lives in docs/PERF.md.

A persistent XLA compilation cache (utils/compile_cache.py, repo-local
.jax_cache/) makes repeat runs skip the minutes-long remote compiles; a
wall-clock budget (TWEEDIEMIX_BENCH_BUDGET_S, default 1500 s) gates each
rider — a stage that doesn't fit is skipped with a recorded reason
instead of letting the driver SIGKILL mid-stage. TWEEDIEMIX_BENCH_SEEDS
overrides the serving batch (0 = latency-only, headline reverts to
s/image); TWEEDIEMIX_BENCH_SEG=0 / TWEEDIEMIX_BENCH_VIDEO=0 /
TWEEDIEMIX_BENCH_INT8=0 / TWEEDIEMIX_BENCH_BF16=0 skip riders
unconditionally.

Weights are random/zeros (real SDXL weights are not downloadable in this
environment); FLOPs, memory traffic, and the trajectory structure are
identical to a real run. Masks use the precomputed-mask path (the
segmentation model benches separately in the seg rider).

On a non-TPU backend this auto-shrinks to the micro config so CI can still
execute it; the recorded metric is only meaningful on TPU.
"""

import gc
import json
import os
import signal
import sys
import time

# Filled in stage by stage; if the driver's timeout SIGTERMs us mid-rider,
# emit what is already measured instead of losing the whole artifact.
_result = {}
_T0 = time.perf_counter()


def _emit_partial_and_exit(signum, frame):
    if _result:
        out = dict(_result)
        out["partial"] = True
        print(json.dumps(out))
        sys.stdout.flush()
    sys.exit(1)


import jax
import jax.numpy as jnp

from tweediemix_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler, TextEmbeds
from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
from tweediemix_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    postprocess_image,
    unscale_latents,
)

BUDGET_S = float(os.environ.get("TWEEDIEMIX_BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def zeros_params(model, *example_args, dtype=None):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_args)["params"]
    # one jitted pytree build: leaf-by-leaf jnp.zeros costs a remote-compile
    # round trip PER LEAF on the tunneled backend (~50 ms cache-hit / ~450 ms
    # miss x ~700 leaves — measured round 5, the dominant bench setup cost)
    mk = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, dtype or s.dtype), shapes)
    )
    return mk()


def sync(x):
    # a host fetch is the reliable barrier on the tunneled backend
    import numpy as np

    np.asarray(jax.device_get(x.ravel()[0]))
    return x


def measure_image(on_tpu: bool, quant, n_seeds: int, mode: str = "cd") -> dict:
    """Build the fusion pipeline (random weights) and time the full
    trajectory + decode; returns {"single_s": ..., ["seeds_s": ...]}.
    All device state is local so it frees on return. ``phases`` in the
    returned dict breaks the stage wall into setup / compile+warm / timed
    seconds so budget regressions are diagnosable from the artifact alone.

    ``mode='lora'`` measures BASELINE config 2 (fusion_sampling_lora.py +
    sample_panda.sh:43-46): stacked rank-4 LoRA q/k/v/out deltas on every
    attention instead of the CD stacked-K/V slots, and the reference's
    default t_stop=0.9 fusion window (joint-CFG tail for the last 10% of
    steps, fusion_sampling_lora.py:547,324)."""
    t_stage = time.perf_counter()
    phases = {}

    def mark(name):
        nonlocal t_stage
        now = time.perf_counter()
        phases[name] = round(now - t_stage, 1)
        t_stage = now

    n_concepts = 3  # cat + dog + background (sample_catdog.sh:19)
    slots = dict(lora_slots=n_concepts + 1) if mode == "lora" else dict(
        concept_slots=n_concepts + 1)
    t_stop = 0.9 if mode == "lora" else 1.0
    if on_tpu:
        ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, quant=quant, **slots)
        vcfg = VAEConfig.sdxl()
        fcfg = FusionConfig(
            n_timesteps=50, guidance_scale=0.8, t_cond=0.2,
            resampling_steps=10, jumping_steps=5, t_stop=t_stop,
            height=1024, width=1024, num_concepts=n_concepts,
        )
        ctx_len, ctx_dim, pool_dim = 77, 2048, 1280
    else:
        ucfg = UNetConfig.micro(quant=quant, **slots)
        vcfg = VAEConfig.tiny()
        fcfg = FusionConfig(
            n_timesteps=10, guidance_scale=0.8, t_cond=0.2,
            resampling_steps=2, jumping_steps=2, t_stop=t_stop,
            height=128, width=128, num_concepts=n_concepts,
        )
        ctx_len, ctx_dim, pool_dim = 16, ucfg.cross_attention_dim, ucfg.pooled_projection_dim

    from tweediemix_tpu.schedulers.ddim import DDIMTable

    table = DDIMTable.create(n_steps=fcfg.n_timesteps)
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)
    h, w = fcfg.latent_hw

    sample2 = jnp.zeros((2, h, w, 4), jnp.float32)
    ctx2 = jnp.zeros((2, ctx_len, ctx_dim), jnp.float32)
    pooled2 = jnp.zeros((2, pool_dim), jnp.float32)
    tids2 = jnp.zeros((2, 6), jnp.float32)
    uparams = zeros_params(unet, sample2, jnp.int32(1), ctx2, pooled2, tids2,
                           jnp.zeros((2,), jnp.int32),
                           dtype=jnp.bfloat16 if on_tpu else None)
    # conv params are spatial-size independent; init with a small image
    vparams = zeros_params(vae, jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1))

    time_ids = jnp.array([[fcfg.height, fcfg.width, 0, 0, fcfg.height, fcfg.width]], jnp.float32)

    def unet_fn(params, x, t, ctx, pooled, idx, cross_kv=None):
        b = x.shape[0]
        return unet.apply(
            {"params": params}, x, t, ctx, pooled, jnp.tile(time_ids, (b, 1)), idx,
            cross_kv=cross_kv,
        )

    from tweediemix_tpu.models.unet2d import precompute_cross_kv

    def kv_builder(params, ctx_rows, idx):
        return precompute_cross_kv(ucfg, params, ctx_rows, idx)

    # TWEEDIEMIX_BENCH_KV=0 drops the per-phase cross-attention K/V cache
    # (~0.5 ms/step benefit) to free its HBM for larger serving batches
    if not int(os.environ.get("TWEEDIEMIX_BENCH_KV", "1")):
        kv_builder = None

    def rows(k, n):
        return (
            0.1 * jax.random.normal(k, (n, ctx_len, ctx_dim), jnp.float32),
            0.1 * jax.random.normal(jax.random.fold_in(k, 9), (n, pool_dim), jnp.float32),
        )

    jc, jp = rows(jax.random.fold_in(key, 1), 2)
    sc, sp = rows(jax.random.fold_in(key, 2), n_concepts - 1)
    cc, cp = rows(jax.random.fold_in(key, 3), n_concepts + 1)
    embeds = TextEmbeds(jc, jp, sc, sp, cc, cp)

    # precomputed region masks (cat left / dog right)
    fg = (
        jnp.zeros((n_concepts - 1, fcfg.height, fcfg.width))
        .at[0, :, : fcfg.width // 2].set(1.0)
        .at[1, :, fcfg.width // 2 :].set(1.0)
    )

    sampler = FusionSampler(
        table, fcfg, unet_fn, unet_params=uparams, kv_builder=kv_builder
    )

    decode = jax.jit(
        lambda vp, x: postprocess_image(
            vae.apply({"params": vp}, unscale_latents(x, vcfg), method=vae.decode)
        )
    )

    def run_batch(seed, num_seeds):
        x = sampler.run(embeds, jax.random.PRNGKey(seed), fg_masks=fg,
                        num_seeds=num_seeds)
        # per-seed decode (matches the pipeline; batch-4 fp32 decode at
        # 1024px would spike HBM)
        return jnp.concatenate(
            [decode(vparams, x[s : s + 1]) for s in range(num_seeds)], axis=0
        )

    def timed(num_seeds, reps=2):
        # min over reps: the tunneled chip shows ~5% run-to-run variance
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            sync(run_batch(1 + r, num_seeds))
            best = min(best, time.perf_counter() - t0)
        return best

    mark("setup")
    sync(run_batch(0, 1))  # compile + warm
    mark("compile_single")
    out = {"single_s": timed(1)}
    mark("timed_single")
    if n_seeds > 1:
        sync(run_batch(0, n_seeds))  # compile + warm
        mark("compile_seeds")
        out["seeds_s"] = timed(n_seeds)
        mark("timed_seeds")
    out["phases"] = phases
    return out


def _free_device_state():
    gc.collect()
    jax.clear_caches()
    gc.collect()


def main():
    signal.signal(signal.SIGTERM, _emit_partial_and_exit)
    on_tpu = jax.default_backend() == "tpu"
    # Headline serving mode. Default since round 5: W8A8 int8 transformer
    # matmuls with per-site STATIC activation scales (ops/quant.py +
    # tools/calibrate_quant.py; the repo-committed chip-calibrated table) —
    # measured 12.64 chip-s/image at seeds=4 vs 14.20-14.46 bf16 and 15.08
    # dynamic-int8 (docs/PERF.md round 5). Fidelity: corr > 0.99 vs fp32
    # (tests/test_quant.py); real checkpoints re-calibrate with a warmup
    # pass. TWEEDIEMIX_BENCH_QUANT=bf16 reverts the headline to bf16;
    # =int8-dynamic measures int8 without the scales table.
    quant_env = os.environ.get("TWEEDIEMIX_BENCH_QUANT", "").strip().lower()
    if quant_env in ("", "int8", "int8_static", "int8-static"):
        quant = "int8"
        os.environ.setdefault(
            "TWEEDIEMIX_QUANT_SCALES",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "quant_scales_sdxl.json"),
        )
    elif quant_env in ("bf16", "0", "off", "none", "no"):
        quant = None
    elif quant_env in ("int8-dynamic", "int8_dynamic"):
        quant = "int8"
        os.environ.pop("TWEEDIEMIX_QUANT_SCALES", None)
    else:
        quant = quant_env  # e.g. int8_conv (expert knob)
    n_seeds = int(os.environ.get("TWEEDIEMIX_BENCH_SEEDS", "4"))
    # TWEEDIEMIX_BENCH_MODE=lora measures BASELINE config 2 (stacked LoRA
    # deltas + t_stop=0.9 window) as the headline; default cd.
    mode = os.environ.get("TWEEDIEMIX_BENCH_MODE", "cd")

    _result["import_s"] = round(time.perf_counter() - _T0, 1)
    m = measure_image(on_tpu, quant, n_seeds, mode=mode)
    dt = m["single_s"]
    result = _result
    result["image_phase_s"] = m.get("phases", {})
    if mode != "cd":
        result["mode"] = mode
    if quant:
        result["quant"] = (
            "int8_static" if os.environ.get("TWEEDIEMIX_QUANT_SCALES")
            else f"{quant}_dynamic"
        )
    if "seeds_s" in m:
        dts = m["seeds_s"]
        # Headline = BASELINE.json's tracked metric: "2-concept SDXL
        # images/min/chip at 50 steps", measured at the serving batch
        # (BASELINE "8 seeds in parallel" config, amortized on one chip).
        # The <4 s north-star is a v5e-8 (8-chip) wall-clock target, i.e. a
        # 32 chip-second budget per image; vs_baseline is measured throughput
        # over the 60/32 = 1.875 images/min/chip that budget implies
        # (docs/PERF.md has the full roofline argument).
        result.update({
            "metric": (
                f"2concept_sdxl_1024_50step_images_per_min_chip_seeds{n_seeds}"
                if on_tpu
                else f"2concept_micro_cpu_images_per_min_seeds{n_seeds}"
            ),
            "value": round(60.0 * n_seeds / dts, 3),
            "unit": "images/min/chip",
            "vs_baseline": round((60.0 * n_seeds / dts) / (60.0 / 32.0), 3),
            f"seeds{n_seeds}_chip_s_per_image": round(dts / n_seeds, 3),
        })
    else:
        result.update({
            "metric": (
                "2concept_sdxl_1024_50step_s_per_image"
                if on_tpu
                else "2concept_micro_cpu_s_per_image"
            ),
            "value": round(dt, 3),
            "unit": "s",
            "vs_baseline": round(4.0 / dt, 3),
        })
    result["single_seed_s_per_image"] = round(dt, 3)
    # both ratio framings, so the artifact is self-describing (r01 reported
    # the latency ratio, r02 the throughput ratio — emit both from now on):
    # - latency: <4 s north-star wall-clock over measured single-seed latency
    # - throughput: measured rate over the 1.875 img/min/chip the 32
    #   chip-second v5e-8 budget implies
    result["vs_baseline_latency"] = round(4.0 / dt, 3)
    if "seeds_s" in m:
        result["vs_baseline_throughput"] = round(
            (60.0 * n_seeds / m["seeds_s"]) / (60.0 / 32.0), 3)
    else:
        result["vs_baseline_throughput"] = round((60.0 / dt) / (60.0 / 32.0), 3)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))

    def stage(name: str, env: str, min_s: float, fn, default: str = "1"):
        """Run one rider inside the wall-clock budget; skips (with a
        recorded reason) rather than letting the driver kill us mid-stage."""
        # tolerant flag parse: ''/'0'/'off'/'false'/'no' disable, anything
        # else enables — a ValueError here after the headline would lose
        # the whole artifact, the exact failure the budget machinery exists
        # to prevent
        if os.environ.get(env, default).strip().lower() in (
                "", "0", "off", "false", "no", "none"):
            result[f"{name}_skipped"] = (
                "disabled via env" if env in os.environ
                else "off by default (A/B recorded in docs/PERF.md round 5; "
                     f"set {env}=1 to re-measure)")
            return
        left = _remaining()
        if left < min_s:
            result[f"{name}_skipped"] = (
                f"budget: {left:.0f}s left < {min_s:.0f}s stage minimum")
            return
        _free_device_state()
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:  # never lose earlier metrics over a rider
            import traceback

            traceback.print_exc(file=sys.stderr)
            result[f"{name}_error"] = f"{type(e).__name__}: {e}"
        finally:
            result[f"{name}_stage_s"] = round(time.perf_counter() - t0, 1)

    # segmentation rider (BASELINE config 3 runs segmentation in the loop;
    # the headline uses the precomputed-mask path, so the seg cost rides
    # along separately). Cheapest stage, so it goes first.
    def seg_stage():
        import bench_segment

        sm = bench_segment.measure()
        result["seg_metric"] = sm["metric"]
        result["seg_ms_per_concept"] = sm["ms_per_concept"]

    # video rider (BASELINE config 4: 16-frame 512px I2V clip, <30 s on
    # v5e-8 = 240 chip-seconds). The image stage's params + compiled
    # trajectory must be freed first (they keep several GiB of HBM
    # resident; the I2V stage measured 2x slower under that pressure).
    def video_stage():
        import bench_video

        vm = bench_video.measure()
        result["video_metric"] = vm["metric"]
        result["video_clip_s"] = vm["s_per_clip"]
        result["video_frames_per_s"] = vm["frames_per_s"]
        result["video_vs_baseline"] = round(240.0 / vm["s_per_clip"], 3)

    # cross-mode rider: whichever serving mode is NOT the headline rides
    # along at single-seed so the graded artifact carries the bf16/int8
    # A/B side by side (same TWEEDIEMIX_BENCH_MODE as the headline — a
    # true A/B, not a silent lora-vs-cd mix).
    def int8_stage():
        mq = measure_image(on_tpu, "int8", n_seeds=0, mode=mode)
        result["single_seed_s_per_image_int8"] = round(mq["single_s"], 3)
        result["int8_phase_s"] = mq.get("phases", {})

    def bf16_stage():
        mq = measure_image(on_tpu, None, n_seeds=0, mode=mode)
        result["single_seed_s_per_image_bf16"] = round(mq["single_s"], 3)
        result["bf16_phase_s"] = mq.get("phases", {})

    stage("seg", "TWEEDIEMIX_BENCH_SEG", 240.0, seg_stage)
    stage("video", "TWEEDIEMIX_BENCH_VIDEO", 420.0, video_stage)
    # The cross-mode A/B rider is opt-in since round 5: even with a warm
    # persistent cache, loading a second full trajectory's executables
    # through the tunneled backend costs ~250-300 s, which pushed the
    # all-stage wall past the 1500 s driver budget (the BENCH_r03 rc=124
    # failure mode). The bf16-vs-int8 A/B is measured and recorded in
    # docs/PERF.md round 5; set TWEEDIEMIX_BENCH_INT8/BF16=1 to re-measure
    # it in-artifact.
    if quant is None:
        stage("int8", "TWEEDIEMIX_BENCH_INT8", 300.0, int8_stage,
              default="0")
    else:
        stage("bf16", "TWEEDIEMIX_BENCH_BF16", 300.0, bf16_stage,
              default="0")

    result["bench_wall_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
