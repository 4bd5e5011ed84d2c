"""Single-concept personalization training CLI.

Flag-compatible core of ``concept_training/diffusers_training_xl_new.py``
(argparse :201-487) and the LoRA variant, as driven by
``singleconcept_train.sh:5-41``. One binary covers Custom-Diffusion
(``--freeze_model crossattn_kv|crossattn``) and LoRA (``--freeze_model
lora``). Data parallelism comes from jit sharding over all local devices
(replacing ``accelerate launch``); learning rate scales with batch ×
accumulation × devices like the reference's ``scale_lr`` (:728-733).

Saves ``delta-{step}.bin`` checkpoints in the reference's torch schema
every ``--save_steps``, plus orbax resume checkpoints (``--resume_step``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", "--model_dir", dest="model_dir",
                   type=str, default=None)
    p.add_argument("--model_preset", type=str, default=None, choices=[None, "tiny"])
    p.add_argument("--instance_data_dir", type=str, default=None)
    p.add_argument("--class_data_dir", type=str, default=None)
    p.add_argument("--instance_prompt", type=str, default=None)
    p.add_argument("--class_prompt", type=str, default=None)
    p.add_argument("--concepts_list", type=str, default=None,
                   help="JSON file with per-concept dirs/prompts")
    p.add_argument("--with_prior_preservation", action="store_true")
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    p.add_argument("--num_class_images", type=int, default=200)
    p.add_argument("--real_prior", action="store_true",
                   help="retrieve real regularization images from LAION")
    p.add_argument("--output_dir", type=str, default="./ckpt")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--crops_coords_top_left_h", type=int, default=0,
                   help="crop-coordinate rows of the SDXL micro-conditioning "
                        "time_ids (diffusers_training_xl_new.py:154-155,449-459)")
    p.add_argument("--crops_coords_top_left_w", type=int, default=0)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--sample_batch_size", type=int, default=4,
                   help="batch size for class-image generation "
                        "(diffusers_training_xl_new.py:306,583)")
    p.add_argument("--num_train_epochs", type=int, default=1,
                   help="used when --max_train_steps is unset: "
                        "max steps = epochs * ceil(len(dataset)/batch)/accum "
                        "(diffusers_training_xl_new.py:308,900-903)")
    p.add_argument("--max_train_steps", type=int, default=251,
                   help="optimizer steps; pass 0 to derive from "
                        "--num_train_epochs like the reference")
    p.add_argument("--save_steps", type=int, default=250)
    p.add_argument("--train_text_encoder", action="store_true",
                   help="train BOTH full text towers alongside the UNet "
                        "attn2 subset (diffusers_training_xl_new.py:301,"
                        "865-869); the delta checkpoint gains "
                        "'text_encoder'/'text_encoder_2' state dicts (:52-53)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine", "cosine_with_restarts", "polynomial"],
                   help="lr schedule over optimizer steps "
                        "(diffusers_training_xl_new.py:354-359)")
    p.add_argument("--lr_warmup_steps", type=int, default=500,
                   help="warmup optimizer steps for --lr_scheduler (:363)")
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--vae_encode_dtype", type=str, default="fp32",
                   choices=["fp32", "bf16"],
                   help="compute dtype for the per-step VAE latent encode "
                        "(and class-image decode). The reference pins the "
                        "training VAE to fp32 (diffusers_training_xl_new.py"
                        ":700) — that stays the default; bf16 measures 91 vs "
                        "174 ms/step at 512px batch 2 on v5e (the encoder is "
                        "bandwidth-bound). Latents are cast back to fp32 at "
                        "the boundary either way.")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="int8 blockwise Adam moment state (the reference's "
                        "bitsandbytes AdamW8bit)")
    p.add_argument("--freeze_model", type=str, default="crossattn_kv",
                   choices=["crossattn_kv", "crossattn", "lora"])
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--modifier_token", type=str, default=None, help="'+'-separated")
    p.add_argument("--initializer_token", type=str, default="ktn+pll+ucd")
    p.add_argument("--hflip", action="store_true")
    p.add_argument("--center_crop", action="store_true",
                   help="center- instead of random-crop class/prior images "
                        "after the shorter-side resize "
                        "(diffusers_data_pipeline_xl.py:124)")
    p.add_argument("--pretrained_vae_model_name_or_path", type=str, default=None,
                   help="separate VAE dir (e.g. the fp16-fix VAE) used for "
                        "latent encoding instead of MODEL_DIR/vae "
                        "(diffusers_training_xl_new.py:670-675)")
    p.add_argument("--dataloader_num_workers", type=int, default=2,
                   help="0 loads batches synchronously on the main thread; "
                        ">=1 decodes/augments on a prefetch worker thread "
                        "(the torch DataLoader(num_workers=...) equivalent — "
                        "one thread suffices here because PIL, the C++ "
                        "augment kernel, and device execution all release "
                        "the GIL; the value sets the prefetch depth)")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat UNet resnet/transformer blocks in backward "
                        "(singleconcept_train.sh:20)")
    p.add_argument("--dp_devices", type=int, default=None,
                   help="data-parallel device count (default: all local "
                        "devices, or all global devices with --multihost; "
                        "1 disables DP)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host DP over DCN: jax.distributed.initialize() "
                        "then a dp mesh over every process's devices; each "
                        "host feeds its own batch shard and only process 0 "
                        "writes checkpoints/metrics. On a TPU pod slice the "
                        "coordinator is discovered from the runtime env; "
                        "class images / prior retrieval must be pre-generated "
                        "(run once single-host first). Replaces the "
                        "reference's accelerate/NCCL DDP launch "
                        "(diffusers_training_xl_new.py:503-508)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for --multihost off-pod "
                        "(CPU/GPU clusters, tests); optional on TPU pods")
    p.add_argument("--num_processes", type=int, default=None,
                   help="process count for --multihost off-pod")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank for --multihost off-pod")
    p.add_argument("--resume_step", type=int, default=None)
    p.add_argument("--report_to", type=str, default="none",
                   help="'none' or a directory for JSONL/TensorBoard metrics")
    p.add_argument("--logging_dir", type=str, default=None,
                   help="metrics directory (the reference's accelerate "
                        "tensorboard dir); used when --report_to is 'none'")
    # Reference flags accepted for drop-in script compatibility but inert on
    # TPU (a warning is printed when one is set to a non-default value):
    #  - mixed_precision / prior_generation_precision / allow_tf32: compute
    #    dtypes are bf16 params + fp32 scheduler/VAE natively (PARITY §2.4);
    #  - enable_xformers_memory_efficient_attention: the Pallas flash kernel
    #    is always on;
    #  - local_rank: jit sharding replaces torch.distributed (use --dp_devices);
    #  - push_to_hub/hub_token/hub_model_id/revision/tokenizer_name: no
    #    network egress in this environment, checkpoints are local dirs;
    #  - validation_prompt/num_validation_images: the reference's validation
    #    block is commented out (diffusers_training_xl_new.py:1122-1146).
    for flag, default in _COMPAT_FLAGS.items():
        if default is False:
            p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
        else:
            p.add_argument(flag, type=type(default) if default is not None else str,
                           default=default, help=argparse.SUPPRESS)
    return p


_COMPAT_FLAGS = {
    "--mixed_precision": None,
    "--prior_generation_precision": None,
    "--allow_tf32": False,
    "--enable_xformers_memory_efficient_attention": False,
    "--local_rank": -1,
    "--push_to_hub": False,
    "--hub_token": None,
    "--hub_model_id": None,
    "--revision": None,
    "--tokenizer_name": None,
    "--validation_prompt": None,
    "--num_validation_images": 4,
}


def _warn_compat_flags(opt):
    for flag, default in _COMPAT_FLAGS.items():
        name = flag.lstrip("-")
        if getattr(opt, name) != default:
            print(f"warning: --{name} is accepted for reference-script "
                  f"compatibility but has no effect on TPU (see cli/train.py)",
                  file=sys.stderr)


def _vae_dtype(opt):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(opt, "vae_encode_dtype", "fp32") == "bf16" else jnp.float32


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)
    _warn_compat_flags(opt)
    if opt.logging_dir and opt.report_to == "none":
        opt.report_to = opt.logging_dir
    os.makedirs(opt.output_dir, exist_ok=True)

    import jax

    # Multi-host bootstrap MUST precede the first backend-initializing call
    # (device queries below); after it, jax.devices() is the global view.
    if opt.multihost:
        from tweediemix_tpu.parallel.mesh import init_distributed

        init_distributed(opt.coordinator_address, opt.num_processes,
                         opt.process_id)
    proc_count = jax.process_count() if opt.multihost else 1
    is_main = (not opt.multihost) or jax.process_index() == 0

    # after the distributed bootstrap: the TPU gate inside initializes the
    # backend, which must not happen before jax.distributed.initialize
    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig, scale_latents
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import TrainConfig
    from tweediemix_tpu.training.data import ConceptSpec, CustomDiffusionDataset
    from tweediemix_tpu.training.trainer import (
        FullTrainState,
        embedding_row_mask,
        full_trainable_mask,
        make_full_optimizer,
        make_full_train_step,
        save_delta_checkpoint,
        save_resume_checkpoint,
    )
    from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer, HashTokenizer

    # --- concepts ---
    if opt.concepts_list:
        with open(opt.concepts_list) as f:
            concepts = [ConceptSpec(**c) for c in json.load(f)]
    else:
        assert opt.instance_data_dir and opt.instance_prompt
        concepts = [ConceptSpec(opt.instance_data_dir, opt.instance_prompt,
                                opt.class_data_dir, opt.class_prompt)]

    # --- real prior retrieval (reference retrieve.py path) ---
    if opt.real_prior and opt.with_prior_preservation:
        from tweediemix_tpu.training.retrieve import retrieve

        for c in concepts:
            if c.class_data_dir and not os.path.isdir(os.path.join(c.class_data_dir, "images")):
                try:
                    n = retrieve(c.class_prompt, c.class_data_dir, opt.num_class_images)
                    print(f"retrieved {n} regularization images for {c.class_prompt!r}")
                except RuntimeError as e:
                    print(f"warning: {e}; continuing without real prior", file=sys.stderr)

    # --- models ---
    key = jax.random.PRNGKey(opt.seed)
    lora = opt.freeze_model == "lora"
    if opt.model_preset == "tiny" or opt.model_dir is None:
        # keep identical to cli/fusion_sampling.py's tiny preset so tiny
        # training checkpoints can be sampled end-to-end
        c1 = CLIPTextConfig.tiny()
        c2 = CLIPTextConfig.tiny(projection_dim=32)
        ucfg = UNetConfig.micro(
            cross_attention_dim=c1.hidden_size + c2.hidden_size,
            pooled_projection_dim=32,
            lora_slots=1 if lora else 0,
            lora_rank=opt.lora_rank,
            detach_first_token_kv=not lora,
            remat=opt.gradient_checkpointing,
        )
        vcfg = VAEConfig.tiny(dtype=_vae_dtype(opt))
        tok1, tok2 = HashTokenizer(c1.vocab_size), HashTokenizer(c2.vocab_size)
        te1_params = jax.jit(CLIPTextModel(c1).init)(key, jnp.zeros((1, 77), jnp.int32))["params"]
        te2_params = jax.jit(CLIPTextModel(c2).init)(
            jax.random.fold_in(key, 1), jnp.zeros((1, 77), jnp.int32))["params"]
        vae = AutoencoderKL(vcfg)
        vae_params = jax.jit(vae.init)(key, jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(0))["params"]
        h = opt.resolution // 8
        unet = UNet2DConditionModel(ucfg)
        uinit = jax.jit(unet.init)(
            key, jnp.zeros((1, h, h, 4)), jnp.int32(1),
            jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            jnp.zeros((1, ucfg.pooled_projection_dim)), jnp.zeros((1, 6)),
        )
        unet_params = uinit["params"]
    else:
        from tweediemix_tpu.models.convert import (
            load_clip_params, load_unet_params, load_vae_params)

        d = opt.model_dir
        c1 = CLIPTextConfig.sdxl_text_encoder(dtype=jnp.bfloat16)
        c2 = CLIPTextConfig.sdxl_text_encoder_2(dtype=jnp.bfloat16)
        ucfg = UNetConfig.sdxl(
            dtype=jnp.bfloat16,
            lora_slots=1 if lora else 0, lora_rank=opt.lora_rank,
            detach_first_token_kv=not lora,
            remat=opt.gradient_checkpointing,
        )
        from tweediemix_tpu.models.convert import vae_config_overrides

        # --pretrained_vae_model_name_or_path points at a standalone VAE dir
        # (e.g. the fp16-fix VAE, reference :670-675); default MODEL_DIR/vae.
        # Honor its configured scaling_factor (the reference trainer scales
        # encoded latents by vae.config.scaling_factor).
        vae_dir = opt.pretrained_vae_model_name_or_path or os.path.join(d, "vae")
        vcfg = VAEConfig.sdxl(dtype=_vae_dtype(opt), **vae_config_overrides(vae_dir))
        tok1 = CLIPBPETokenizer.from_dir(os.path.join(d, "tokenizer"))
        tok2 = CLIPBPETokenizer.from_dir(os.path.join(d, "tokenizer_2"))
        # bf16 params (trainable leaves are promoted to fp32 masters below);
        # fp32 everything would not fit training in one chip's HBM
        te1_params = load_clip_params(os.path.join(d, "text_encoder"), dtype=jnp.bfloat16)
        te2_params = load_clip_params(os.path.join(d, "text_encoder_2"), dtype=jnp.bfloat16)
        vae = AutoencoderKL(vcfg)
        vae_params = load_vae_params(vae_dir)
        unet = UNet2DConditionModel(ucfg)
        unet_params = load_unet_params(os.path.join(d, "unet"), dtype=jnp.bfloat16)
        from tweediemix_tpu.models.convert import (
            validate_clip_params, validate_unet_params, validate_vae_params)

        validate_clip_params(c1, te1_params)
        validate_clip_params(c2, te2_params)
        validate_vae_params(vcfg, vae_params)
        # validate against the plain config: lora slots are stacked on below
        validate_unet_params(UNetConfig.sdxl(dtype=jnp.bfloat16), unet_params)
        if lora:
            from tweediemix_tpu.concepts.delta import stack_lora_params

            unet_params = stack_lora_params(unet_params, [], rank=opt.lora_rank)

    # --- modifier tokens (reference :800-858) ---
    import dataclasses as dc

    from tweediemix_tpu.models.clip import resize_token_embeddings
    from flax import traverse_util as tu

    modifier_tokens = opt.modifier_token.split("+") if opt.modifier_token else []
    initializers = opt.initializer_token.split("+")
    ids1, ids2 = [], []
    for i, tok in enumerate(modifier_tokens):
        tok1.add_tokens(tok)
        tok2.add_tokens(tok)
        ids1.append(tok1.convert_tokens_to_ids(tok))
        ids2.append(tok2.convert_tokens_to_ids(tok))
    if modifier_tokens:
        te1_params = resize_token_embeddings(te1_params, max(ids1) + 1, rng=key)
        te2_params = resize_token_embeddings(te2_params, max(ids2) + 1, rng=key)
        # init new rows from the initializer token's row
        for params, tok, ids in ((te1_params, tok1, ids1), (te2_params, tok2, ids2)):
            emb = np.array(tu.flatten_dict(params)[("token_embedding", "embedding")])
            for j, tid in enumerate(ids):
                init_tok = initializers[min(j, len(initializers) - 1)].split("+")[0]
                emb[tid] = emb[tok.convert_tokens_to_ids(init_tok)]
            flat = dict(tu.flatten_dict(params))
            flat[("token_embedding", "embedding")] = jnp.asarray(emb)
            params.clear()
            params.update(tu.unflatten_dict(flat))
        c1 = dc.replace(c1, vocab_size=max(ids1) + 1)
        c2 = dc.replace(c2, vocab_size=max(ids2) + 1)

    if opt.train_text_encoder and opt.gradient_checkpointing:
        # full-tower grads need remat to fit beside the UNet in HBM
        c1 = dc.replace(c1, remat=True)
        c2 = dc.replace(c2, remat=True)
    te1 = CLIPTextModel(c1)
    te2 = CLIPTextModel(c2)

    # --- class-image generation when the class dir is empty
    # (reference diffusers_training_xl_new.py:561-600) ---
    latent_factor = 2 ** (len(vcfg.block_out_channels) - 1)
    if opt.with_prior_preservation and not opt.real_prior:
        from tweediemix_tpu.models.vae import postprocess_image, unscale_latents
        from tweediemix_tpu.training.class_gen import generate_class_images

        def _has_images(d):
            from tweediemix_tpu.training.data import _list_images

            return d and os.path.isdir(d) and _list_images(d)

        for c in concepts:
            if c.class_data_dir and c.class_prompt and not _has_images(c.class_data_dir):
                if opt.multihost:
                    raise SystemExit(
                        f"--multihost: class images for {c.class_prompt!r} "
                        f"are missing in {c.class_data_dir}; generate them "
                        "with a single-host run first (every process would "
                        "otherwise race writing the same directory)")
                def enc(prompts):
                    i1 = jnp.asarray(tok1(prompts), jnp.int32)
                    i2 = jnp.asarray(tok2(prompts), jnp.int32)
                    p1 = te1.apply({"params": te1_params}, i1)[0]
                    p2_, _, pooled, _ = te2.apply({"params": te2_params}, i2)
                    return jnp.concatenate([p1, p2_], -1), pooled

                cctx, cpool = enc([c.class_prompt])
                uctx, upool = enc([""])
                ctx2 = jnp.concatenate([uctx, cctx], 0)
                pool2 = jnp.concatenate([upool, cpool], 0)
                tids1 = jnp.array([[opt.resolution, opt.resolution, 0, 0,
                                    opt.resolution, opt.resolution]], jnp.float32)

                def unet_fn(p, x, t, cx, pl, idx):
                    return unet.apply({"params": p}, x, t, cx, pl,
                                      jnp.tile(tids1, (x.shape[0], 1)), idx)

                def decode(x):
                    z = unscale_latents(x.astype(jnp.float32), vcfg)
                    return postprocess_image(
                        vae.apply({"params": vae_params}, z, method=vae.decode))

                n = generate_class_images(
                    c.class_data_dir, opt.num_class_images, ctx2, pool2,
                    unet_fn, unet_params, decode,
                    (opt.resolution // latent_factor, opt.resolution // latent_factor),
                    n_steps=25, guidance_scale=6.0,
                    batch=opt.sample_batch_size, seed=opt.seed,
                )
                print(f"generated {n} class images for {c.class_prompt!r}")

    ds = CustomDiffusionDataset(
        concepts, tok1, tok2, size=opt.resolution,
        with_prior_preservation=opt.with_prior_preservation,
        num_class_images=opt.num_class_images, hflip=opt.hflip,
        center_crop=opt.center_crop,
        # disjoint per-host sampling streams under --multihost
        seed=opt.seed + (jax.process_index() if opt.multihost else 0),
        latent_factor=latent_factor,
    )

    # --- data parallelism (replaces accelerate DDP,
    # diffusers_training_xl_new.py:503-508,913-920): params replicated,
    # batch sharded on a 1-D dp mesh; XLA inserts the grad all-reduce.
    # train_batch_size is per-device like the reference's.
    n_dev = opt.dp_devices or (
        jax.device_count() if opt.multihost else jax.local_device_count())
    if opt.multihost and n_dev != jax.device_count():
        raise SystemExit(
            f"--multihost requires the dp mesh to span every global device "
            f"(got --dp_devices {n_dev}, global {jax.device_count()}): a "
            "partial mesh would leave some processes with no addressable "
            "shard to feed")
    mesh = None
    if n_dev > 1:
        from tweediemix_tpu.parallel.mesh import make_mesh

        mesh = make_mesh({"dp": n_dev}, devices=jax.devices()[:n_dev])
        if is_main:
            print(f"data parallelism over {n_dev} devices"
                  + (f" on {proc_count} hosts" if proc_count > 1 else "")
                  + f" (global batch {opt.train_batch_size * n_dev})")

    accum = opt.gradient_accumulation_steps
    if not opt.max_train_steps:
        # reference: epochs × ceil(len(dataloader)/accum) (:900-903)
        import math

        per_epoch = math.ceil(math.ceil(len(ds) / (opt.train_batch_size * n_dev)) / accum)
        opt.max_train_steps = opt.num_train_epochs * per_epoch
        print(f"max_train_steps derived from {opt.num_train_epochs} epochs: "
              f"{opt.max_train_steps}")

    lr = opt.learning_rate
    if opt.scale_lr:
        lr *= opt.gradient_accumulation_steps * opt.train_batch_size * n_dev
    if opt.lr_scheduler != "constant":
        from tweediemix_tpu.training.lr_schedules import get_lr_schedule

        lr = get_lr_schedule(opt.lr_scheduler, lr, opt.lr_warmup_steps,
                             opt.max_train_steps)
    tcfg = TrainConfig(
        learning_rate=lr,
        max_grad_norm=opt.max_grad_norm,
        adam_weight_decay=opt.adam_weight_decay,
        adam_beta1=opt.adam_beta1,
        adam_beta2=opt.adam_beta2,
        adam_epsilon=opt.adam_epsilon,
        prior_loss_weight=opt.prior_loss_weight,
        with_prior_preservation=opt.with_prior_preservation,
        freeze_model=opt.freeze_model,
        use_8bit_adam=opt.use_8bit_adam,
    )
    params = {"unet": unet_params, "te1": te1_params, "te2": te2_params}
    mask = full_trainable_mask(params, opt.freeze_model, bool(modifier_tokens),
                               train_text_encoder=opt.train_text_encoder)
    # bf16 checkpoints: trainable leaves get fp32 master copies (AMP)
    from tweediemix_tpu.training.trainer import promote_trainable_to_fp32

    params = promote_trainable_to_fp32(params, mask)
    optimizer = make_full_optimizer(tcfg, mask, opt.gradient_accumulation_steps)
    acp = training_alphas_cumprod()
    # original_size + crops_coords_top_left + target_size, the reference's
    # compute_time_ids (diffusers_training_xl_new.py:150-158)
    time_ids = jnp.array(
        [[opt.resolution, opt.resolution,
          opt.crops_coords_top_left_h, opt.crops_coords_top_left_w,
          opt.resolution, opt.resolution]], jnp.float32
    )
    rm1 = embedding_row_mask(c1.vocab_size, ids1) if modifier_tokens else None
    rm2 = embedding_row_mask(c2.vocab_size, ids2) if modifier_tokens else None
    step_fn = make_full_train_step(unet, te1, te2, tcfg, acp, optimizer, rm1, rm2,
                                   time_ids, mask=mask)
    # donate the state: without it params+optimizer live twice (input +
    # output buffers) and full-SDXL training cannot fit in one chip's HBM
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        train_step = jax.jit(
            step_fn,
            in_shardings=(rep, NamedSharding(mesh, P("dp")), rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    else:
        train_step = jax.jit(step_fn, donate_argnums=(0,))

    from tweediemix_tpu.training.trainer import trainable_subset

    state = FullTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=optimizer.init(trainable_subset(params, mask)),
    )
    if mesh is not None:
        from tweediemix_tpu.parallel.mesh import replicate

        state = replicate(mesh, state)
    if opt.resume_step is not None:
        from tweediemix_tpu.training.trainer import load_resume_checkpoint

        resume_dir = os.path.join(opt.output_dir, "resume")
        ckpt_path = os.path.join(resume_dir, f"state_{opt.resume_step}")
        if opt.multihost and not os.path.exists(ckpt_path):
            # every process restores; the dir is written collectively, so a
            # multi-host resume needs storage shared by all hosts — fail
            # early with the actual requirement instead of inside orbax
            raise FileNotFoundError(
                f"--resume_step {opt.resume_step} under --multihost requires "
                f"the resume checkpoint on storage shared by every host; "
                f"{ckpt_path} is not visible on process "
                f"{jax.process_index()} (see docs/MIGRATION.md)")
        state = load_resume_checkpoint(resume_dir, opt.resume_step, state)
        print(f"resumed from step {opt.resume_step}")

    def encode_fn(vp, px, rng):
        mean, logvar = vae.apply({"params": vp}, px, method=vae.encode)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        # fp32 at the boundary: the diffusion-loss math is unchanged by the
        # encoder's compute dtype choice
        return scale_latents(z, vcfg).astype(jnp.float32)

    encode = jax.jit(encode_fn)

    from tweediemix_tpu.utils.logging import MetricsLogger

    # non-main hosts get a no-op logger: constructing a TB SummaryWriter
    # creates an events file at construction time, so a live logger on every
    # host would drop stray event files into a (possibly shared) log dir
    logger = MetricsLogger(
        None if (opt.report_to == "none" or not is_main) else opt.report_to)

    # state.step counts micro (accumulation) steps; user-facing step counts,
    # save cadence, and checkpoint names are in optimizer steps like the
    # reference's global_step (diffusers_training_xl_new.py:1071-1098)
    rng = jax.random.PRNGKey(opt.seed)
    start_micro = int(state.step)
    start_opt_step = start_micro // accum
    micro_steps = (opt.max_train_steps - start_opt_step) * accum
    # prefetch: decode/augment/tokenize the next batches on a worker thread
    # while the device runs the current step. The step counter is tracked
    # host-side — int(state.step) per micro step would be a device sync
    # that stalls dispatch and serializes data loading with compute.
    from tweediemix_tpu.training.data import prefetch_batches

    # each process feeds its share of the global batch; under --multihost the
    # local shards are assembled into one global dp-sharded jax.Array per step
    batch_iter = ds.batches(opt.train_batch_size * n_dev // proc_count,
                            micro_steps)
    if opt.dataloader_num_workers > 0:
        batch_iter = prefetch_batches(batch_iter, depth=opt.dataloader_num_workers)
    # the train_step rng must be identical on every host (replicated input);
    # the VAE-encode noise stream covers host-local rows, so it forks per host
    enc_rng = jax.random.fold_in(rng, jax.process_index()) if opt.multihost else rng
    if opt.multihost and mesh is not None:
        from tweediemix_tpu.parallel.mesh import replicate as _replicate

        rng = _replicate(mesh, rng)  # host-local key -> global replicated
    for i, batch_np in enumerate(batch_iter):
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        latents = encode(vae_params, batch.pop("pixel_values"),
                         jax.random.fold_in(enc_rng, 1000 + i))
        batch["latents"] = latents
        if opt.multihost and mesh is not None:
            from tweediemix_tpu.parallel.mesh import place_global_batch

            batch = place_global_batch(mesh, batch)
        state, metrics = train_step(state, batch, rng)
        opt_step, at_boundary = divmod(start_micro + i + 1, accum)
        if at_boundary == 0:
            if is_main:
                logger.log(opt_step, {k: float(v) for k, v in metrics.items()})
                if opt_step % 10 == 1 or opt_step == opt.max_train_steps:
                    print(f"step {opt_step}: loss {float(metrics['loss']):.4f}")
            if opt_step > start_opt_step and opt_step % opt.save_steps == 0:
                if is_main:
                    path = os.path.join(opt.output_dir, f"delta-{opt_step}.bin")
                    save_delta_checkpoint(path, state, mask, modifier_tokens,
                                          ids1, ids2,
                                          save_text_encoder=opt.train_text_encoder)
                # the orbax save is a collective (it opens with a global
                # barrier and gates primary-host writes internally): EVERY
                # process must enter it, or process 0 deadlocks in the
                # barrier under --multihost. Only the np-based delta save
                # and prints stay main-gated.
                save_resume_checkpoint(os.path.join(opt.output_dir, "resume"),
                                       state, step=opt_step)
                if is_main:
                    print(f"saved {path}")

    final_step = int(state.step) // accum
    if is_main:
        final = os.path.join(opt.output_dir, f"delta-{final_step}.bin")
        save_delta_checkpoint(final, state, mask, modifier_tokens, ids1, ids2,
                              save_text_encoder=opt.train_text_encoder)
        print(f"saved {final}")
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
