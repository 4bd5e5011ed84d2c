"""Validate a real-scale Custom-Diffusion train step on the TPU chip.

Full SDXL UNet + both CLIP towers, 512px (64x64 latents), batch 2
(instance+prior), bf16 params, trainable-subset grads, optional remat —
the singleconcept_train.sh configuration. Records step time and peak HBM
(results committed in docs/TRAIN_SCALE.md).

Usage: python tools/validate_train_scale.py [--no-remat] [--batch N]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--bf16-master", action="store_true",
                    help="keep trainable leaves bf16 (default: fp32 masters, "
                         "the cli/train.py AMP configuration)")
    ap.add_argument("--use-8bit-adam", action="store_true",
                    help="int8 blockwise Adam moment state")
    ap.add_argument("--train-text-encoder", action="store_true",
                    help="train both full text towers (remat on the CLIP "
                         "layers as in cli/train.py)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()

    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import TrainConfig
    from tweediemix_tpu.training.trainer import (
        FullTrainState,
        embedding_row_mask,
        full_trainable_mask,
        make_full_optimizer,
        make_full_train_step,
        trainable_subset,
    )

    dev = jax.devices()[0]
    print("device:", dev, "platform:", jax.default_backend())

    remat = not args.no_remat
    b = args.batch
    h = args.res // 8
    te_remat = args.train_text_encoder and remat
    c1 = CLIPTextConfig.sdxl_text_encoder(dtype=jnp.bfloat16, remat=te_remat)
    c2 = CLIPTextConfig.sdxl_text_encoder_2(dtype=jnp.bfloat16, remat=te_remat)
    ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, detach_first_token_kv=True, remat=remat)
    unet = UNet2DConditionModel(ucfg)
    te1, te2 = CLIPTextModel(c1), CLIPTextModel(c2)

    key = jax.random.PRNGKey(0)
    ids = jnp.zeros((b, 77), jnp.int32).at[:, -1].set(49407)
    shapes = {
        "unet": jax.eval_shape(
            unet.init, key, jnp.zeros((b, h, h, 4)), jnp.int32(1),
            jnp.zeros((b, 77, ucfg.cross_attention_dim)),
            jnp.zeros((b, ucfg.pooled_projection_dim)), jnp.zeros((b, 6)),
        )["params"],
        "te1": jax.eval_shape(te1.init, key, ids)["params"],
        "te2": jax.eval_shape(te2.init, key, ids)["params"],
    }

    def make_leaf(path, s):
        # small random values in bf16 so the math is non-degenerate
        seed = abs(hash("/".join(str(p) for p in path))) % (2**31)
        return 0.02 * jax.random.normal(jax.random.PRNGKey(seed), s.shape, jnp.bfloat16)

    params = jax.tree_util.tree_map_with_path(make_leaf, shapes)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B bf16, remat={remat}, batch={b}, res={args.res}")

    def hbm(tag):
        try:
            st = dev.memory_stats()
            print(f"[{tag}] HBM in use {st['bytes_in_use']/2**30:.2f} GiB, "
                  f"peak {st['peak_bytes_in_use']/2**30:.2f} GiB")
        except Exception as e:
            print(f"[{tag}] memory_stats unavailable: {e}")

    jax.block_until_ready(params)
    hbm("params created")

    tcfg = TrainConfig(learning_rate=1e-5, with_prior_preservation=True,
                       use_8bit_adam=args.use_8bit_adam)
    mask = full_trainable_mask(params, "crossattn_kv", True,
                               train_text_encoder=args.train_text_encoder)
    if not args.bf16_master:
        from tweediemix_tpu.training.trainer import promote_trainable_to_fp32

        params = promote_trainable_to_fp32(params, mask)
        print("trainable leaves promoted to fp32 masters")
    n_train = sum(x.size for x in trainable_subset(params, mask).values())
    print(f"trainable: {n_train/1e6:.1f}M")
    opt = make_full_optimizer(tcfg, mask)
    rm1 = embedding_row_mask(c1.vocab_size, [42])
    rm2 = embedding_row_mask(c2.vocab_size, [42])
    tids = jnp.array([[args.res, args.res, 0, 0, args.res, args.res]], jnp.float32)
    # donate the state: without it params+opt live twice (in+out) and the
    # 3.4B-param step cannot fit in 15.75 GiB HBM
    step = jax.jit(make_full_train_step(
        unet, te1, te2, tcfg, training_alphas_cumprod(), opt, rm1, rm2, tids,
        mask=mask), donate_argnums=(0,))

    state = FullTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt.init(trainable_subset(params, mask)),
    )
    batch = {
        "latents": jax.random.normal(key, (b, h, h, 4)),
        "mask": jnp.ones((b, h, h, 1)),
        "ids_one": ids,
        "ids_two": ids,
        "is_prior": jnp.tile(jnp.array([0.0, 1.0]), b)[:b],
    }

    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        for f in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, f, None)
            if v is not None:
                print(f"memory_analysis.{f}: {v/2**30:.2f} GiB")
    step = compiled

    t0 = time.time()
    try:
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["loss"])
    except Exception:
        hbm("OOM/failure")
        raise
    print(f"compile+first step: {time.time()-t0:.1f}s, loss {float(metrics['loss']):.4f}")
    hbm("after first step")

    n_steps = 5
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / n_steps
    print(f"step time: {dt*1000:.0f} ms ({n_steps} steps)")
    try:
        stats = dev.memory_stats()
        print(f"peak HBM: {stats['peak_bytes_in_use']/2**30:.2f} GiB "
              f"(limit {stats.get('bytes_limit', 0)/2**30:.2f} GiB)")
    except Exception as e:
        print("memory_stats unavailable:", e)
    print(f"RESULT remat={remat} batch={b} res={args.res} "
          f"train_text_encoder={args.train_text_encoder} "
          f"step_ms={dt*1000:.0f} loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()
