"""Multi-concept fusion sampling CLI.

Flag-compatible with the reference entry point
(``fusion_generation/fusion_sampling.py:533-589`` /
``fusion_sampling_lora.py``, as driven by ``sample_catdog.sh:33-36``):
``+``-separated prompt/concept/modifier/checkpoint lists, background concept
last. One binary covers both Custom-Diffusion and LoRA checkpoints via
``--mode`` (the reference splits them into two scripts); ``--t_stop``
activates the LoRA fusion window.

Model weights come from ``--model_dir`` (a local HF-layout SDXL checkpoint;
this environment has no network) or ``--model_preset tiny`` (random-init
small models for smoke runs). Segmentation uses the in-process segmentation
stage when available, or ``--mask_dir`` with per-concept mask images
(mirroring the reference's mask-JPG handoff, fusion_sampling.py:461-466).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=182)
    p.add_argument("--output_path", type=str, default="./out")
    p.add_argument("--output_path_all", type=str, default=None)
    p.add_argument("--negative_prompt", type=str,
                   default="blurry, ugly, black, low res, unrealistic, blurry face")
    p.add_argument("--sd_version", type=str, default="xl", choices=["xl"],
                   help="model family (the TPU rebuild targets SDXL)")
    p.add_argument("--t_cond", type=float, default=0.4)
    p.add_argument("--t_stop", type=float, default=None,
                   help="LoRA fusion window end (default 0.9 in --mode lora, "
                        "matching fusion_sampling_lora.py:547; unused in cd)")
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--n_timesteps", type=int, default=50)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--prompt_orig", type=str, default="")
    p.add_argument("--seg_concepts", type=str, default="")
    p.add_argument("--personal_checkpoint", type=str, default="")
    p.add_argument("--concepts", type=str, required=True)
    p.add_argument("--modifier_token", type=str, required=True)
    p.add_argument("--resampling_steps", type=int, default=10)
    p.add_argument("--jumping_steps", type=int, default=5)
    p.add_argument("--crops_coords_top_left_h", type=int, default=0)
    p.add_argument("--crops_coords_top_left_w", type=int, default=0)
    p.add_argument("--resolution_h", type=int, default=1024)
    p.add_argument("--resolution_w", type=int, default=1024)
    # Reference flags accepted for drop-in sample_*.sh compatibility but
    # inert here: device placement is jit sharding (--mesh_devices), and the
    # segmentation stage runs in-process on the mesh instead of on a second
    # GPU via subprocess (fusion_sampling.py:458-459, sample_catdog.sh:5-7).
    p.add_argument("--device", type=str, default=None, help=argparse.SUPPRESS)
    p.add_argument("--seg_gpu", type=int, default=None, help=argparse.SUPPRESS)
    # TPU-rebuild additions
    p.add_argument("--mode", type=str, default="cd", choices=["cd", "lora"])
    p.add_argument("--model_dir", type=str, default=None,
                   help="local SDXL checkpoint dir (HF layout)")
    p.add_argument("--model_preset", type=str, default=None, choices=[None, "tiny"],
                   help="random-init preset for smoke runs (no weights needed)")
    p.add_argument("--mask_dir", type=str, default=None,
                   help="directory with precomputed '<seg_concept>.jpg' masks")
    p.add_argument("--seg_preset", type=str, default=None,
                   choices=[None, "heuristic", "sam-random", "sam"],
                   help="in-process segmentation stage when no --mask_dir "
                        "(default: 'sam' when --sam_checkpoint and "
                        "--detector_dir are given, else 'heuristic')")
    p.add_argument("--sam_checkpoint", type=str, default=None,
                   help="segment-anything ViT-H checkpoint (.pth/safetensors) "
                        "for --seg_preset sam")
    p.add_argument("--detector_dir", type=str, default=None,
                   help="HF-layout OWL-ViT detection dir for --seg_preset sam")
    p.add_argument("--box_threshold", type=float, default=0.20,
                   help="detector score threshold (lang_sam.py predict)")
    p.add_argument("--detector", type=str, default="auto",
                   choices=["auto", "owlvit", "dino"],
                   help="box-detector backend for the sam preset: OWL-ViT "
                        "(HF dir), the reference's GroundingDINO "
                        "(models/dino.py; accepts the shipped "
                        "groundingdino_swinb_cogcoor.pth), or sniff the "
                        "checkpoint (auto)")
    p.add_argument("--profile", type=str, default=None,
                   help="directory for a jax.profiler trace + phase timings")
    p.add_argument("--num_seeds", type=int, default=1,
                   help="sample this many seeds (seed..seed+n-1) in one batch")
    p.add_argument("--mesh_devices", type=int, default=1,
                   help="shard every forward's batch rows over this many "
                        "devices (seeds-in-parallel serving layout)")
    p.add_argument("--quant", type=str, default=None, choices=[None, "int8", "int8_conv"],
                   help="run the UNet's transformer matmuls as dynamic W8A8 "
                        "int8 on the MXU (opt-in speed/fidelity trade; "
                        "ops/quant.py); int8_conv additionally quantizes "
                        "the resnet/resample convs. Checkpoints are "
                        "unchanged.")
    return p


def _load_tiny_stack(opt, n_concepts):
    """Random-init tiny models for smoke runs."""
    import jax
    import jax.numpy as jnp

    from tweediemix_tpu.models.clip import CLIPTextConfig, DualTextEncoder
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.utils.tokenizer import HashTokenizer

    key = jax.random.PRNGKey(0)
    c1 = CLIPTextConfig.tiny()
    c2 = CLIPTextConfig.tiny(projection_dim=32)
    text = DualTextEncoder.random_init(c1, c2, key)
    tok1, tok2 = HashTokenizer(1000), HashTokenizer(1000)

    ucfg = UNetConfig.micro(
        cross_attention_dim=c1.hidden_size + c2.hidden_size,
        pooled_projection_dim=32,
        quant=getattr(opt, "quant", None),
    )
    unet = UNet2DConditionModel(ucfg)
    h = opt.resolution_h // 8
    w = opt.resolution_w // 8
    sample = jnp.zeros((2, h, w, 4))
    ctx = jnp.zeros((2, 77, ucfg.cross_attention_dim))
    pooled = jnp.zeros((2, ucfg.pooled_projection_dim))
    tids = jnp.zeros((2, 6))
    uparams = jax.jit(unet.init)(key, sample, jnp.int32(1), ctx, pooled, tids)["params"]

    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    vparams = jax.jit(vae.init)(key, jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(1))["params"]
    return ucfg, uparams, vae, vparams, text, tok1, tok2


def _load_model_dir(opt):
    """Load SDXL weights + tokenizers from a local HF-layout directory."""
    import jax.numpy as jnp

    from tweediemix_tpu.models.clip import CLIPTextConfig, DualTextEncoder
    from tweediemix_tpu.models.convert import (
        load_clip_params,
        load_unet_params,
        load_vae_params,
    )
    from tweediemix_tpu.models.unet2d import UNetConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer

    from tweediemix_tpu.models.convert import (
        validate_clip_params,
        validate_unet_params,
        validate_vae_params,
    )

    d = opt.model_dir
    ucfg = UNetConfig.sdxl(dtype=jnp.bfloat16, quant=getattr(opt, "quant", None))
    uparams = load_unet_params(os.path.join(d, "unet"))
    validate_unet_params(ucfg, uparams)
    from tweediemix_tpu.models.convert import vae_config_overrides

    # honor checkpoint-configured scaling_factor / latents_mean / latents_std
    # (the reference's final decode denormalizes with them when present,
    # fusion_sampling.py:505-518)
    vcfg = VAEConfig.sdxl(**vae_config_overrides(os.path.join(d, "vae")))
    vae = AutoencoderKL(vcfg)
    vparams = load_vae_params(os.path.join(d, "vae"))
    validate_vae_params(vcfg, vparams)
    c1 = CLIPTextConfig.sdxl_text_encoder(dtype=jnp.bfloat16)
    c2 = CLIPTextConfig.sdxl_text_encoder_2(dtype=jnp.bfloat16)
    p1 = load_clip_params(os.path.join(d, "text_encoder"))
    p2 = load_clip_params(os.path.join(d, "text_encoder_2"))
    validate_clip_params(c1, p1)
    validate_clip_params(c2, p2)
    text = DualTextEncoder(c1, c2, p1, p2)
    tok1 = CLIPBPETokenizer.from_dir(os.path.join(d, "tokenizer"))
    tok2 = CLIPBPETokenizer.from_dir(os.path.join(d, "tokenizer_2"))
    return ucfg, uparams, vae, vparams, text, tok1, tok2


def load_fg_masks_from_dir(mask_dir, seg_concepts, h, w):
    import numpy as np
    from PIL import Image

    masks = []
    for name in seg_concepts.split("+"):
        img = Image.open(os.path.join(mask_dir, name + ".jpg")).convert("L").resize((w, h))
        masks.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(masks)


def resolve_segment_fn(opt):
    """Resolve the seg preset and build the boundary-step segment fn.

    Shared by ``cli/fusion_sampling`` and ``cli/serve`` so their behavior
    cannot drift: real weights supplied → "sam" (like the reference);
    exactly one of --sam_checkpoint/--detector_dir without an explicit
    --seg_preset is an error, not a silent heuristic fallback. Mutates
    ``opt.seg_preset`` in place. Returns None when --mask_dir supplies
    precomputed masks (or no seg concepts are configured).
    """
    if opt.seg_preset is None:
        # real weights supplied → real segmentation, like the reference
        opt.seg_preset = (
            "sam" if (opt.sam_checkpoint and opt.detector_dir) else "heuristic"
        )
        if bool(opt.sam_checkpoint) != bool(opt.detector_dir):
            given, missing = (
                ("--sam_checkpoint", "--detector_dir")
                if opt.sam_checkpoint else ("--detector_dir", "--sam_checkpoint")
            )
            raise SystemExit(
                f"{given} was supplied without {missing}: the sam preset "
                f"needs both (detector→box→SAM, lang_sam.py:20-24). Pass "
                f"both, or set --seg_preset heuristic explicitly to run "
                f"without model weights."
            )
    if opt.mask_dir is None and opt.seg_concepts:
        # fail fast: without masks the sampler would die mid-trajectory
        from tweediemix_tpu.segmentation import make_segment_fn

        return make_segment_fn(
            opt.seg_concepts, opt.output_path, opt.seg_preset,
            sam_checkpoint=opt.sam_checkpoint, detector_dir=opt.detector_dir,
            box_threshold=opt.box_threshold,
            detector=getattr(opt, "detector", "auto"),
        )
    return None


def build_pipeline(opt):
    """Flags → ready ``TweedieMixPipeline``. The single source of truth for
    checkpoint loading, the lora t_stop default, and FusionConfig wiring —
    shared by this one-shot CLI and ``cli/serve`` so their behavior cannot
    drift (same rationale as ``resolve_segment_fn``). Mutates ``opt.t_stop``
    in place when it resolves the default."""
    from tweediemix_tpu.concepts.delta import load_reference_delta
    from tweediemix_tpu.fusion.pipeline import TweedieMixPipeline
    from tweediemix_tpu.fusion.sampler import FusionConfig

    n = len(opt.concepts.split("+"))

    if opt.model_preset == "tiny" or opt.model_dir is None:
        stack = _load_tiny_stack(opt, n)
    else:
        stack = _load_model_dir(opt)
    ucfg, uparams, vae, vparams, text, tok1, tok2 = stack

    if opt.personal_checkpoint:
        checkpoints = [
            load_reference_delta(path)
            for path in opt.personal_checkpoint.split("+")
        ]
    else:
        checkpoints = [
            {"unet": {}, "modifier_token": {}, "modifier_token_2": {}} for _ in range(n)
        ]

    if opt.t_stop is None:
        # reference default: fusion_sampling_lora.py:547 uses 0.9
        opt.t_stop = 0.9 if opt.mode == "lora" else 1.0
    fcfg = FusionConfig(
        n_timesteps=opt.n_timesteps,
        guidance_scale=opt.guidance_scale,
        t_cond=opt.t_cond,
        t_stop=opt.t_stop if opt.mode == "lora" else 1.0,
        resampling_steps=opt.resampling_steps,
        jumping_steps=opt.jumping_steps,
        height=opt.resolution_h,
        width=opt.resolution_w,
        num_concepts=n,
    )

    return TweedieMixPipeline.from_concept_checkpoints(
        base_unet_params=uparams,
        checkpoints=checkpoints,
        modifier_tokens=opt.modifier_token.split("+"),
        unet_cfg=ucfg,
        vae=vae,
        vae_params=vparams,
        text=text,
        tokenizer_1=tok1,
        tokenizer_2=tok2,
        fusion_config=fcfg,
        mode=opt.mode,
        segment_fn=resolve_segment_fn(opt),
    )


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)
    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    for name in ("device", "seg_gpu"):
        if getattr(opt, name) is not None:
            print(f"warning: --{name} is accepted for reference-script "
                  f"compatibility but has no effect on TPU (device placement "
                  f"is jit sharding; segmentation runs in-process)",
                  file=sys.stderr)
    out_all = opt.output_path_all or opt.output_path
    os.makedirs(opt.output_path, exist_ok=True)
    os.makedirs(out_all, exist_ok=True)

    from tweediemix_tpu.fusion.pipeline import save_image

    pipe = build_pipeline(opt)

    # multi-prompt seed batching: "||" separates per-seed prompt sets in
    # --prompt / --prompt_orig (must match --num_seeds)
    if "||" in opt.prompt:
        from tweediemix_tpu.fusion.pipeline import stack_text_embeds

        prompts = opt.prompt.split("||")
        origs = opt.prompt_orig.split("||")
        if len(prompts) != opt.num_seeds or len(origs) != opt.num_seeds:
            raise ValueError(
                f"--prompt has {len(prompts)} '||'-separated sets and "
                f"--prompt_orig {len(origs)}; both must equal --num_seeds "
                f"({opt.num_seeds})"
            )
        embeds = stack_text_embeds([
            pipe.prepare_text_embeds(
                p.strip(), o.strip(), opt.concepts, opt.modifier_token,
                negative_prompt=opt.negative_prompt,
            )
            for p, o in zip(prompts, origs)
        ])
    else:
        embeds = pipe.prepare_text_embeds(
            opt.prompt, opt.prompt_orig, opt.concepts, opt.modifier_token,
            negative_prompt=opt.negative_prompt,
        )

    fg_masks = None
    if opt.mask_dir is not None:
        fg_masks = load_fg_masks_from_dir(
            opt.mask_dir, opt.seg_concepts, opt.resolution_h, opt.resolution_w
        )

    from tweediemix_tpu.utils.profiling import PhaseTimer, trace
    import contextlib

    timer = PhaseTimer()
    prof_ctx = trace(opt.profile) if opt.profile else contextlib.nullcontext()
    with prof_ctx:
        with timer.phase(f"sample_{opt.num_seeds}_seeds"):
            imgs = pipe.sample(embeds, seed=opt.seed, fg_masks=fg_masks,
                               num_seeds=opt.num_seeds,
                               mesh_devices=opt.mesh_devices)
        orig_names = [o.strip() for o in opt.prompt_orig.split("||")]
        for i in range(imgs.shape[0]):
            name = orig_names[i] if len(orig_names) > 1 else orig_names[0]
            path = os.path.join(out_all, f"{name}_{opt.seed + i}.png")
            save_image(imgs[i : i + 1], path)
            print(f"saved {path}")
    if opt.profile:
        timer.dump(os.path.join(opt.profile, "phase_timings.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
