"""Measure the training loop WITH the host input pipeline at SDXL scale.

`tools/validate_train_scale.py` times the pure device step on synthetic
device-resident batches; this tool adds what the reference's torch
DataLoader does off the hot path — JPEG decode, paste augmentation, BPE
tokenization, host→device transfer, VAE encode — by running the same loop
body as ``cli/train.py`` over a real ``CustomDiffusionDataset`` built from
synthetic on-disk JPEGs (singleconcept_train.sh config: 512px, batch 2
instance+prior).

Two knobs reproduce the un-pipelined baseline for comparison:

* ``--no-prefetch``: consume ``ds.batches`` synchronously on the main
  thread (batch N+1 is built only after step N is dispatched).
* ``--sync-step-counter``: call ``int(state.step)`` every micro step (a
  device fetch that blocks until the step finishes — the pre-round-3
  ``cli/train.py`` behavior), serializing host data work with the device.

Usage: python tools/bench_train_io.py [--steps N] [--no-prefetch]
       [--sync-step-counter] [--accum N]
"""

import argparse
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_image_dir(d: str, n: int, size: int = 512) -> None:
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"), quality=92)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--no-prefetch", action="store_true")
    ap.add_argument("--sync-step-counter", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="measure all three variants in one process "
                         "(prefetch / no-prefetch / no-prefetch+sync)")
    ap.add_argument("--batch", type=int, default=1,
                    help="instance rows (prior preservation doubles it)")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--vae_dtype", type=str, default="fp32",
                    choices=["fp32", "bf16"],
                    help="VAE encode compute dtype (cli/train.py "
                         "--vae_encode_dtype)")
    args = ap.parse_args()

    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig, scale_latents
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import TrainConfig
    from tweediemix_tpu.training.data import (
        ConceptSpec,
        CustomDiffusionDataset,
        prefetch_batches,
    )
    from tweediemix_tpu.training.trainer import (
        FullTrainState,
        embedding_row_mask,
        full_trainable_mask,
        make_full_optimizer,
        make_full_train_step,
        promote_trainable_to_fp32,
        trainable_subset,
    )
    from tweediemix_tpu.utils.tokenizer import HashTokenizer

    print("platform:", jax.default_backend())
    b = args.batch * 2  # instance + prior rows per micro step
    res = args.res
    h = res // 8

    tmp = tempfile.mkdtemp(prefix="bench_train_io_")
    inst_dir = os.path.join(tmp, "inst")
    cls_dir = os.path.join(tmp, "cls")
    make_image_dir(inst_dir, args.images, res)
    make_image_dir(cls_dir, args.images, res)

    # tokenize cost is negligible next to JPEG decode; the hash tokenizer
    # avoids needing on-disk vocab/merges files
    tok = HashTokenizer(49408)
    ds = CustomDiffusionDataset(
        [ConceptSpec(instance_data_dir=inst_dir, instance_prompt="photo of a <c1> dog",
                     class_data_dir=cls_dir, class_prompt="photo of a dog")],
        tokenizer_one=tok, tokenizer_two=tok, size=res,
        with_prior_preservation=True,
    )

    key = jax.random.PRNGKey(0)
    c1 = CLIPTextConfig.sdxl_text_encoder(dtype=jnp.bfloat16)
    c2 = CLIPTextConfig.sdxl_text_encoder_2(dtype=jnp.bfloat16)
    ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, detach_first_token_kv=True, remat=True)
    unet = UNet2DConditionModel(ucfg)
    te1, te2 = CLIPTextModel(c1), CLIPTextModel(c2)
    vcfg = VAEConfig.sdxl(
        dtype=jnp.bfloat16 if args.vae_dtype == "bf16" else jnp.float32)
    vae = AutoencoderKL(vcfg)

    ids0 = jnp.zeros((b, 77), jnp.int32).at[:, -1].set(49407)
    shapes = {
        "unet": jax.eval_shape(
            unet.init, key, jnp.zeros((b, h, h, 4)), jnp.int32(1),
            jnp.zeros((b, 77, ucfg.cross_attention_dim)),
            jnp.zeros((b, ucfg.pooled_projection_dim)), jnp.zeros((b, 6)),
        )["params"],
        "te1": jax.eval_shape(te1.init, key, ids0)["params"],
        "te2": jax.eval_shape(te2.init, key, ids0)["params"],
    }

    def make_leaf(path, s):
        seed = abs(hash("/".join(str(p) for p in path))) % (2**31)
        return 0.02 * jax.random.normal(jax.random.PRNGKey(seed), s.shape, jnp.bfloat16)

    params = jax.tree_util.tree_map_with_path(make_leaf, shapes)
    vshapes = jax.eval_shape(vae.init, key, jnp.zeros((1, 32, 32, 3)),
                             jax.random.PRNGKey(1))["params"]
    vparams = jax.tree_util.tree_map_with_path(
        lambda p, s: 0.02 * jax.random.normal(
            jax.random.PRNGKey(abs(hash(str(p))) % (2**31)), s.shape, jnp.float32),
        vshapes)

    tcfg = TrainConfig(learning_rate=1e-5, with_prior_preservation=True,
                       use_8bit_adam=True)
    mask = full_trainable_mask(params, "crossattn_kv", True)
    params = promote_trainable_to_fp32(params, mask)
    opt = make_full_optimizer(tcfg, mask)
    rm1 = embedding_row_mask(c1.vocab_size, [42])
    rm2 = embedding_row_mask(c2.vocab_size, [42])
    tids = jnp.array([[res, res, 0, 0, res, res]], jnp.float32)
    step = jax.jit(make_full_train_step(
        unet, te1, te2, tcfg, training_alphas_cumprod(), opt, rm1, rm2, tids,
        mask=mask), donate_argnums=(0,))
    state = FullTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt.init(trainable_subset(params, mask)),
    )

    def encode_fn(vp, pixels, k):
        mean, logvar = vae.apply({"params": vp}, pixels, method=vae.encode)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(k, mean.shape)
        return scale_latents(z, vcfg).astype(jnp.float32)

    encode = jax.jit(encode_fn)
    rng = jax.random.PRNGKey(0)

    def run(n_steps, sync_counter, use_prefetch, warm):
        it = ds.batches(args.batch, n_steps)
        if use_prefetch:
            it = prefetch_batches(it)
        nonlocal state
        t0 = time.time()
        last_metrics = None
        for i, batch_np in enumerate(it):
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            batch["latents"] = encode(vparams, batch.pop("pixel_values"),
                                      jax.random.fold_in(rng, 1000 + i))
            state, last_metrics = step(state, batch, rng)
            if sync_counter:
                micro = int(state.step)  # device fetch (old behavior)
            else:
                micro = i + 1  # host-side counter (cli/train.py behavior)
            if micro % args.accum == 0:
                # the logger fetch at every optimizer-step boundary
                _ = {k: float(v) for k, v in last_metrics.items()}
        # host fetch, not block_until_ready — the only reliable timing
        # barrier through the tunneled backend (CLAUDE.md)
        _ = float(jax.device_get(last_metrics["loss"]))
        dt = (time.time() - t0) / n_steps
        if warm:
            print(f"RESULT prefetch={use_prefetch} sync_counter={sync_counter} "
                  f"accum={args.accum} vae_dtype={args.vae_dtype} "
                  f"wall_ms_per_micro_step={dt*1000:.1f}")
        return dt

    run(2, args.sync_step_counter, not args.no_prefetch, warm=False)  # compile
    if args.all:
        for sync_counter, use_prefetch in (
            (False, True), (False, False), (True, False),
        ):
            run(args.steps, sync_counter, use_prefetch, warm=True)
    else:
        run(args.steps, args.sync_step_counter, not args.no_prefetch, warm=True)


if __name__ == "__main__":
    main()
