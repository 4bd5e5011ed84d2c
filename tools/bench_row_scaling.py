"""Measure the UNet step cost vs batch-row count on the real chip.

Purpose (VERDICT r04 item 4): the 4-chip single-image latency projection in
docs/PERF.md assumed per-row efficiency equal to the batched measurement —
optimistic at batch 1/chip. Under 4-way concept-row sharding each chip runs
the fused step at ONE row, so the honest projection multiplies the step
counts by the *measured* batch-1 step time, not batched-time/4. This tool
measures a K-step scan of the serving-shaped UNet forward (cross-KV cache
hoisted, bf16, 1024²) at rows ∈ {1, 2, 4}, prints per-step times and the
rebuilt projection.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_row_scaling.py
       [--res 1024] [--steps 10] [--rows 1 2 4]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rows", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tweediemix_tpu.models.unet2d import (
        UNet2DConditionModel,
        UNetConfig,
        precompute_cross_kv,
    )

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    if on_tpu:
        ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, concept_slots=4)
        hw, ctx_len, ctx_dim, pool = args.res // 8, 77, 2048, 1280
    else:
        ucfg = UNetConfig.micro(concept_slots=4)
        hw, ctx_len = 8, 16
        ctx_dim, pool = ucfg.cross_attention_dim, ucfg.pooled_projection_dim

    model = UNet2DConditionModel(ucfg)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        model.init, key, jnp.zeros((1, hw, hw, 4)), jnp.int32(1),
        jnp.zeros((1, ctx_len, ctx_dim)), jnp.zeros((1, pool)),
        jnp.zeros((1, 6)), jnp.zeros((1,), jnp.int32),
    )["params"]
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # single jitted pytree build (docs/PERF.md round 5 bench-wall anatomy)
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, dt if s.dtype == jnp.float32 else s.dtype),
        shapes))()

    results = {}
    for r in args.rows:
        ctx = 0.1 * jax.random.normal(key, (r, ctx_len, ctx_dim))
        pooled = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (r, pool))
        tids = jnp.tile(jnp.asarray([[args.res, args.res, 0, 0, args.res,
                                      args.res]], jnp.float32), (r, 1))
        idx = (jnp.arange(r) % 4).astype(jnp.int32)
        x0 = jax.random.normal(jax.random.fold_in(key, 2), (r, hw, hw, 4))

        kv = precompute_cross_kv(ucfg, params, ctx.astype(ucfg.dtype), idx)

        @jax.jit
        def scan_steps(params, x, kv):
            def body(x, t):
                eps = model.apply({"params": params}, x, t, ctx, pooled,
                                  tids, idx, cross_kv=kv)
                return x - 0.001 * eps, ()

            x, _ = jax.lax.scan(body, x,
                                jnp.arange(args.steps, 0, -1, dtype=jnp.int32) * 20)
            return x

        sync(scan_steps(params, x0, kv))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(scan_steps(params, x0, kv))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.steps * 1000
        results[r] = ms
        print(f"rows={r}: {ms:8.1f} ms/step   ({ms / r:7.1f} ms/row)")

    if 1 in results and 4 in results:
        # rebuild the docs/PERF.md:58-69 latency-layout projection from the
        # measured batch-1 step cost. Step counts from the headline
        # trajectory (50 DDIM steps, resampling 10, jumping 5, t_cond 0.2):
        # prologue ≈ 10 joint-shaped resampling iterations (N+1=4 rows
        # prologue forwards + 2-row inner steps) + 10 early joint steps,
        # fused ≈ 40 steps at 4 rows; see fusion/sampler.py.
        s1, s4 = results[1] / 1000, results[4] / 1000
        fused_steps, pro_steps, joint_steps, jump_steps = 40, 21, 10, 5
        fused_4chip = fused_steps * s1        # 4 rows over 4 chips → 1 row/chip
        pro_4chip = pro_steps * s1
        joint_2chip = joint_steps * s1        # 2 rows over 2 chips
        jump_2chip = jump_steps * s1
        decode = 0.11
        ici = 0.1
        total = fused_4chip + pro_4chip + joint_2chip + jump_2chip + decode + ici
        eff = s4 / (4 * s1)
        print(f"\nbatch-1 efficiency vs batched: {eff * 100:.0f}% "
              f"(s4={s4 * 1000:.1f} ms vs 4×s1={4 * s1 * 1000:.1f} ms)")
        print(f"rebuilt 4-chip single-image projection: {total:.2f} s "
              f"(fused {fused_4chip:.2f} + prologue {pro_4chip:.2f} + "
              f"joint {joint_2chip:.2f} + jump {jump_2chip:.2f} + "
              f"decode {decode:.2f} + ICI {ici:.2f})")


if __name__ == "__main__":
    main()
