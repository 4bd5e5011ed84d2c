"""Image-to-video CLI — the reference's ``run_video.py`` equivalent.

Takes a generated multi-concept image (e.g. the fusion sampler's output),
runs the I2V pipeline with first-frame feature injection, and exports a GIF.
Defaults mirror ``run_video.py:26-40``: 50 steps, 512², 16 frames, fps 8,
guidance 9, injection_timestep 0.02, interp_ratio 0.7.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", type=str, required=True, help="conditioning image (first frame)")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str,
                   default="Distorted, discontinuous, Ugly, blurry, low resolution, motionless, "
                           "static, disfigured, disconnected limbs, Ugly faces, incomplete arms")
    p.add_argument("--output", type=str, default="./video.gif")
    p.add_argument("--seed", type=int, default=8888)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--n_timesteps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--injection_timestep", type=float, default=0.02)
    p.add_argument("--interp_ratio", type=float, default=0.7)
    p.add_argument("--decode_chunk_size", type=int, default=1,
                   help="frames decoded per VAE call (reference run_video.py "
                        "decode chunk 1; larger values trade decode memory "
                        "for fewer, better-utilized conv dispatches)")
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--model_preset", type=str, default=None, choices=[None, "tiny"])
    p.add_argument("--num_seeds", type=int, default=1,
                   help="clips sampled in parallel from the same conditioning "
                        "image (batched serving; seed b folds in its index). "
                        "Outputs <output>_b.gif per extra clip.")
    p.add_argument("--mesh_devices", type=int, default=1,
                   help="shard the clip rows of every forward over this many "
                        "devices (1-D dp mesh; requires num_seeds % n == 0)")
    p.add_argument("--quant", type=str, default=None, choices=[None, "int8", "int8_conv"],
                   help="run the video UNet's transformer matmuls (spatial + "
                        "temporal) as dynamic W8A8 int8 on the MXU (opt-in "
                        "speed/fidelity trade; ops/quant.py); int8_conv "
                        "additionally quantizes the resnet/resample convs. "
                        "Checkpoints are unchanged.")
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    import jax

    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tweediemix_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
    )
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.utils.tokenizer import HashTokenizer
    from tweediemix_tpu.video.pipeline import I2VPipeline, VideoConfig, export_gif

    key = jax.random.PRNGKey(opt.seed)
    f = opt.num_frames
    if opt.model_preset == "tiny" or opt.model_dir is None:
        tcfg = CLIPTextConfig.tiny()
        vcfg_clip = CLIPVisionConfig.tiny(projection_dim=tcfg.hidden_size)
        ucfg = UNet3DConfig.tiny(cross_attention_dim=tcfg.hidden_size,
                                 quant=opt.quant)
        vcfg = VAEConfig.tiny()
        tok = HashTokenizer(tcfg.vocab_size)

        text = CLIPTextModel(tcfg)
        vision = CLIPVisionModel(vcfg_clip)
        unet = UNet3DConditionModel(ucfg)
        vae = AutoencoderKL(vcfg)

        tparams = jax.jit(text.init)(key, jnp.zeros((1, 77), jnp.int32))["params"]
        visparams = jax.jit(vision.init)(
            jax.random.fold_in(key, 1),
            jnp.zeros((1, vcfg_clip.image_size, vcfg_clip.image_size, 3)),
        )["params"]
        vparams = jax.jit(vae.init)(
            jax.random.fold_in(key, 2), jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(0)
        )["params"]
        latent_factor = 2 ** (len(vcfg.block_out_channels) - 1)
        h, w = opt.height // latent_factor, opt.width // latent_factor
        uparams = jax.jit(unet.init)(
            jax.random.fold_in(key, 3),
            jnp.zeros((1, f, h, w, 4)), jnp.int32(1),
            jnp.zeros((1, 8, ucfg.cross_attention_dim)),
            jnp.zeros((1, f, h, w, 4)),
            jnp.zeros((1, 1, ucfg.cross_attention_dim)),
            jnp.float32(8.0),
        )["params"]
    else:
        # local HF-layout ali-vilab/i2vgen-xl dir (run_video.py:21-22)
        from tweediemix_tpu.models.convert import (
            load_clip_params,
            load_clip_vision_params,
            load_unet3d_params,
            load_vae_params,
        )
        from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer

        from tweediemix_tpu.models.convert import (
            validate_clip_params,
            validate_clip_vision_params,
            validate_unet3d_params,
            validate_vae_params,
        )

        d = opt.model_dir
        ucfg = UNet3DConfig.i2vgen(dtype=jnp.bfloat16, quant=opt.quant)
        uparams = load_unet3d_params(os.path.join(d, "unet"), dtype=jnp.bfloat16)
        validate_unet3d_params(ucfg, uparams)
        vcfg = VAEConfig(scaling_factor=0.18215)
        vparams = load_vae_params(os.path.join(d, "vae"))
        validate_vae_params(vcfg, vparams)
        tcfg = CLIPTextConfig.i2vgen_text_encoder(dtype=jnp.bfloat16)
        tparams = load_clip_params(os.path.join(d, "text_encoder"))
        validate_clip_params(tcfg, tparams)
        vcfg_clip = CLIPVisionConfig.vit_h(dtype=jnp.bfloat16)
        visparams = load_clip_vision_params(os.path.join(d, "image_encoder"))
        validate_clip_vision_params(vcfg_clip, visparams)
        tok = CLIPBPETokenizer.from_dir(os.path.join(d, "tokenizer"))

        text = CLIPTextModel(tcfg)
        vision = CLIPVisionModel(vcfg_clip)
        unet = UNet3DConditionModel(ucfg)
        vae = AutoencoderKL(vcfg)
        latent_factor = 2 ** (len(vcfg.block_out_channels) - 1)

    vcfg_run = VideoConfig(
        n_timesteps=opt.n_timesteps, guidance_scale=opt.guidance_scale,
        num_frames=f, height=opt.height, width=opt.width, fps=opt.fps,
        injection_timestep=opt.injection_timestep, interp_ratio=opt.interp_ratio,
        latent_factor=latent_factor, decode_chunk_size=opt.decode_chunk_size,
    )
    pipe = I2VPipeline(vcfg_run, unet, uparams, vae, vparams)

    # text conditioning: the I2VGen-XL pipeline defaults to clip_skip=1 —
    # final_layer_norm(hidden_states[-2]) for BOTH the positive and negative
    # prompt (pipeline_i2vgen_xl.py:505,202-217,268-282)
    encode = jax.jit(lambda p, ids: text.apply({"params": p}, ids)[3])
    ids_c = jnp.asarray(tok([opt.prompt]), jnp.int32)
    ids_u = jnp.asarray(tok([opt.negative_prompt]), jnp.int32)
    ctx_c = encode(tparams, ids_c)
    ctx_u = encode(tparams, ids_u)

    # image conditioning: VAE path in [-1,1]; CLIP path normalized with
    # CLIP stats (pipeline_i2vgen_xl.py:_encode_image, do_normalize=True)
    from tweediemix_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    img = Image.open(opt.image).convert("RGB").resize((opt.width, opt.height))
    img01 = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
    arr = img01 * 2.0 - 1.0
    clip_in = jax.image.resize(
        img01, (1, vcfg_clip.image_size, vcfg_clip.image_size, 3), "bilinear"
    )
    clip_in = (clip_in - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
    img_emb = vision.apply({"params": visparams}, clip_in)[:, None, :]

    b = opt.num_seeds
    arr_b = jnp.repeat(arr, b, axis=0) if b > 1 else arr
    video = pipe.generate(ctx_c, ctx_u, arr_b, img_emb, seed=opt.seed,
                          mesh_devices=opt.mesh_devices)
    os.makedirs(os.path.dirname(os.path.abspath(opt.output)), exist_ok=True)
    if b == 1:
        export_gif(video, opt.output, fps=opt.fps)
        print(f"saved {opt.output} ({video.shape[0]} frames)")
    else:
        stem, ext = os.path.splitext(opt.output)
        for bi in range(b):
            path = opt.output if bi == 0 else f"{stem}_{bi}{ext}"
            export_gif(video[bi], path, fps=opt.fps)
            print(f"saved {path} ({video.shape[1]} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
