"""Warm-pipeline serving CLI: load + compile once, sample per request.

The reference has no serving story — every image pays the full process
start + model load + (on CUDA) kernel selection cost
(``fusion_generation/fusion_sampling.py:533-589`` is a one-shot script).
Here the TweedieMix pipeline is built once, the first request pays the XLA
compile, and every subsequent request with the same geometry reuses the
compiled trajectory (the serving layout BASELINE's "8 seeds in parallel"
config assumes).

Protocol: JSON Lines on stdin → JSON Lines on stdout. Each request:

    {"prompt": "a cat+a dog+bg", "prompt_orig": "a cat and a dog",
     "seed": 3821, "num_seeds": 4, "output_path": "./out",
     "negative_prompt": "...", "id": "req-1"}

``prompt`` may use the ``||`` multi-prompt contract (per-seed prompt
sets). Model geometry (concepts, checkpoints, resolution, steps) is fixed
at startup via the same flags as ``cli/fusion_sampling``; a request that
omits a field inherits the startup flag value. Response per line:

    {"id": "req-1", "status": "ok", "files": ["./out/....png"],
     "latency_s": 14.2, "warm": true}

An empty line or EOF shuts the server down cleanly.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_parser():
    from tweediemix_tpu.cli.fusion_sampling import build_parser as base_parser

    p = base_parser()
    p.description = __doc__
    return p


def make_pipeline(opt):
    """Build the pipeline exactly like cli/fusion_sampling.main does."""
    from tweediemix_tpu.cli.fusion_sampling import _load_model_dir, _load_tiny_stack
    from tweediemix_tpu.concepts.delta import load_reference_delta
    from tweediemix_tpu.fusion.pipeline import TweedieMixPipeline
    from tweediemix_tpu.fusion.sampler import FusionConfig

    concepts = opt.concepts.split("+")
    n = len(concepts)
    if opt.model_preset == "tiny" or opt.model_dir is None:
        stack = _load_tiny_stack(opt, n)
    else:
        stack = _load_model_dir(opt)
    ucfg, uparams, vae, vparams, text, tok1, tok2 = stack

    if opt.personal_checkpoint:
        checkpoints = [load_reference_delta(p) for p in opt.personal_checkpoint.split("+")]
    else:
        checkpoints = [
            {"unet": {}, "modifier_token": {}, "modifier_token_2": {}} for _ in range(n)
        ]
    if opt.t_stop is None:
        opt.t_stop = 0.9 if opt.mode == "lora" else 1.0
    fcfg = FusionConfig(
        n_timesteps=opt.n_timesteps, guidance_scale=opt.guidance_scale,
        t_cond=opt.t_cond, t_stop=opt.t_stop if opt.mode == "lora" else 1.0,
        resampling_steps=opt.resampling_steps, jumping_steps=opt.jumping_steps,
        height=opt.resolution_h, width=opt.resolution_w, num_concepts=n,
    )
    from tweediemix_tpu.cli.fusion_sampling import resolve_segment_fn

    segment_fn = resolve_segment_fn(opt)
    return TweedieMixPipeline.from_concept_checkpoints(
        base_unet_params=uparams, checkpoints=checkpoints,
        modifier_tokens=opt.modifier_token.split("+"), unet_cfg=ucfg,
        vae=vae, vae_params=vparams, text=text,
        tokenizer_1=tok1, tokenizer_2=tok2, fusion_config=fcfg,
        mode=opt.mode, segment_fn=segment_fn,
    )


def handle_request(pipe, opt, req: dict, warm: bool) -> dict:
    from tweediemix_tpu.fusion.pipeline import save_image, stack_text_embeds

    prompt = req.get("prompt", opt.prompt)
    prompt_orig = req.get("prompt_orig", opt.prompt_orig)
    negative = req.get("negative_prompt", opt.negative_prompt)
    seed = int(req.get("seed", opt.seed))
    num_seeds = int(req.get("num_seeds", opt.num_seeds))
    out_dir = req.get("output_path", opt.output_path)
    os.makedirs(out_dir, exist_ok=True)

    if "||" in prompt:
        prompts = [p.strip() for p in prompt.split("||")]
        origs = [o.strip() for o in prompt_orig.split("||")]
        if len(prompts) != num_seeds or len(origs) != num_seeds:
            raise ValueError(
                f"'||' prompt sets ({len(prompts)}) must equal num_seeds ({num_seeds})")
        embeds = stack_text_embeds([
            pipe.prepare_text_embeds(p, o, opt.concepts, opt.modifier_token,
                                     negative_prompt=negative)
            for p, o in zip(prompts, origs)
        ])
        origs_per_seed = origs
    else:
        embeds = pipe.prepare_text_embeds(
            prompt, prompt_orig, opt.concepts, opt.modifier_token,
            negative_prompt=negative)
        origs_per_seed = [prompt_orig] * num_seeds

    fg_masks = None
    if opt.mask_dir is not None:
        from tweediemix_tpu.cli.fusion_sampling import load_fg_masks_from_dir

        fg_masks = load_fg_masks_from_dir(
            opt.mask_dir, opt.seg_concepts, opt.resolution_h, opt.resolution_w)

    t0 = time.perf_counter()
    imgs = pipe.sample(embeds, seed=seed, fg_masks=fg_masks,
                       num_seeds=num_seeds, mesh_devices=opt.mesh_devices)
    files = []
    for s in range(imgs.shape[0]):
        stem = origs_per_seed[s].split("+")[0].strip() or "sample"
        path = os.path.join(out_dir, f"{stem}_{seed + s}.png")
        save_image(imgs[s : s + 1], path)
        files.append(path)
    return {
        "status": "ok", "files": files,
        "latency_s": round(time.perf_counter() - t0, 3), "warm": warm,
    }


def main(argv=None, stdin=None, stdout=None) -> int:
    opt = build_parser().parse_args(argv)
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout

    t0 = time.perf_counter()
    pipe = make_pipeline(opt)
    print(f"pipeline ready in {time.perf_counter() - t0:.1f}s; "
          f"reading JSONL requests from stdin", file=sys.stderr)

    warm = False
    for line in stdin:
        line = line.strip()
        if not line:
            break
        req = None
        try:
            req = json.loads(line)
            resp = handle_request(pipe, opt, req, warm)
            warm = True  # compiled trajectory reused from now on
        except Exception as e:  # report, keep serving
            resp = {"status": "error", "error": f"{type(e).__name__}: {e}"}
        if isinstance(req, dict) and "id" in req:
            resp["id"] = req["id"]
        stdout.write(json.dumps(resp) + "\n")
        stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
