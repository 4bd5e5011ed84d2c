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
    """One pipeline builder shared with the one-shot CLI (so a flag or
    default added there cannot silently drift from the server)."""
    from tweediemix_tpu.cli.fusion_sampling import build_pipeline

    return build_pipeline(opt)


def handle_request(pipe, opt, req: dict, compiled: set) -> dict:
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

    # "warm" = this request's trace geometry has already been compiled.
    # num_seeds and precomputed-vs-live masks each force a fresh XLA trace;
    # a first-of-its-geometry request pays minutes on the remote compile
    # service and must not report warm=true.
    geometry = (num_seeds, fg_masks is None)
    warm = geometry in compiled

    t0 = time.perf_counter()
    imgs = pipe.sample(embeds, seed=seed, fg_masks=fg_masks,
                       num_seeds=num_seeds, mesh_devices=opt.mesh_devices)
    files = []
    for s in range(imgs.shape[0]):
        stem = origs_per_seed[s].split("+")[0].strip() or "sample"
        path = os.path.join(out_dir, f"{stem}_{seed + s}.png")
        save_image(imgs[s : s + 1], path)
        files.append(path)
    compiled.add(geometry)
    return {
        "status": "ok", "files": files,
        "latency_s": round(time.perf_counter() - t0, 3), "warm": warm,
    }


def main(argv=None, stdin=None, stdout=None) -> int:
    opt = build_parser().parse_args(argv)
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout

    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    t0 = time.perf_counter()
    pipe = make_pipeline(opt)
    print(f"pipeline ready in {time.perf_counter() - t0:.1f}s; "
          f"reading JSONL requests from stdin", file=sys.stderr)

    compiled = set()  # trace geometries already paid for
    for line in stdin:
        line = line.strip()
        if not line:
            break
        req = None
        try:
            req = json.loads(line)
            resp = handle_request(pipe, opt, req, compiled)
        except Exception as e:  # report, keep serving
            resp = {"status": "error", "error": f"{type(e).__name__}: {e}"}
        if isinstance(req, dict) and "id" in req:
            resp["id"] = req["id"]
        stdout.write(json.dumps(resp) + "\n")
        stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
