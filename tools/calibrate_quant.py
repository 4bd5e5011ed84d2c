#!/usr/bin/env python
"""Calibrate per-site static activation scales for the int8 serving path.

Runs warmup UNet forwards (the headline fusion geometry: batch N+1=4 rows,
a few timesteps across the trajectory) with ``TWEEDIEMIX_QUANT_CALIBRATE=1``
so every ``w8a8_matmul`` site sows its input abs-max into the
``quant_stats`` collection (``ops/quant.py::sow_amax``), then writes a JSON
table of ``{site_path: abs_max}`` for ``TWEEDIEMIX_QUANT_SCALES``.

With the table loaded, the activation quantization at each site is a fixed
per-tensor scale: the round/clip/int8-cast is purely elementwise and fuses
into the activation's producer, deleting the dynamic per-row abs-max
reduce (the suspected cause of the seeds=4 int8 regression — docs/PERF.md
round 3). The reference has no quantized serving path at all
(``fusion_generation/fusion_sampling.py:492`` stops at fp16 autocast).

Usage:
  PYTHONPATH=.:/root/.axon_site python tools/calibrate_quant.py \
      [--out quant_scales.json] [--res 1024] [--margin 1.25] [--micro]
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp


def calibrate(model, params, probe_args, margin: float = 1.25) -> dict:
    """Run the model over ``probe_args`` (a list of apply-arg tuples) with
    the quant_stats collection mutable; return {site: margin * abs_max}."""
    import flax

    # jit the probe forward: op-by-op dispatch through the tunneled remote
    # backend would take minutes per SDXL call; one compile, three fast runs
    @jax.jit
    def probe(p, *args):
        return model.apply({"params": p}, *args, mutable=["quant_stats"])

    amax = {}
    for args in probe_args:
        _, stats = probe(params, *args)
        flat = flax.traverse_util.flatten_dict(stats["quant_stats"])
        for path, v in flat.items():
            # sow leaf name "amax" is bookkeeping; any other leaf (e.g. the
            # merged self-attention "qkv") is part of the site key
            parts = [p for p in path if p != "amax"]
            key = "/".join(parts)
            val = float(jax.device_get(v))
            amax[key] = max(amax.get(key, 0.0), val)
    return {k: margin * v for k, v in amax.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="quant_scales.json")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--margin", type=float, default=1.25,
                    help="headroom multiplier over the observed abs-max")
    ap.add_argument("--micro", action="store_true",
                    help="micro config (CPU smoke)")
    args = ap.parse_args()

    os.environ["TWEEDIEMIX_QUANT_CALIBRATE"] = "1"
    if args.micro:
        # the axon sitecustomize overrides the JAX_PLATFORMS env var; the
        # programmatic update is the reliable CPU switch (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    n = 3  # concepts incl. background; fused batch rows = n + 1
    if args.micro or jax.default_backend() != "tpu":
        ucfg = UNetConfig.micro(concept_slots=n + 1, quant="int8")
        hw, ctx_len = 8, 16
        ctx_dim, pool = ucfg.cross_attention_dim, ucfg.pooled_projection_dim
    else:
        ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, concept_slots=n + 1,
                               quant="int8")
        hw, ctx_len, ctx_dim, pool = args.res // 8, 77, 2048, 1280

    model = UNet2DConditionModel(ucfg)
    key = jax.random.PRNGKey(0)
    b = n + 1
    x = jax.random.normal(key, (b, hw, hw, 4), jnp.float32)
    ctx = 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                  (b, ctx_len, ctx_dim), jnp.float32)
    pooled = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (b, pool),
                                     jnp.float32)
    tids = jnp.tile(jnp.array([[hw * 8, hw * 8, 0, 0, hw * 8, hw * 8]],
                              jnp.float32), (b, 1))
    idx = jnp.arange(b, dtype=jnp.int32)

    shapes = jax.eval_shape(model.init, key, x, jnp.int32(1), ctx, pooled,
                            tids, idx)["params"]
    # small random weights so activations are representative, matching the
    # random-weights bench (real checkpoints are not downloadable here)
    leaves = jax.tree_util.tree_leaves_with_path(shapes)
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(shapes),
        [0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, s.dtype)
         for i, (_, s) in enumerate(leaves)],
    )

    probes = [(x, jnp.int32(t), ctx, pooled, tids, idx)
              for t in (999, 501, 1)]
    table = calibrate(model, params, probes, margin=args.margin)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    vals = sorted(table.values())
    print(f"calibrated {len(table)} sites -> {args.out}; abs-max "
          f"min {vals[0]:.3g} / median {vals[len(vals) // 2]:.3g} / "
          f"max {vals[-1]:.3g}")


if __name__ == "__main__":
    main()
