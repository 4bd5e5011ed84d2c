"""Standalone text-guided mask extraction CLI — ``text_segment/
run_expand.py`` parity.

For each ``+``-separated concept: predict its mask, rectangular-expand,
black out before the next concept, resolve pairwise overlap, and save
``<concept>.jpg`` masks into ``--output_path`` (the exact file contract the
reference sampler consumes, ``run_expand.py:7-87``).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--text_condition", type=str, required=True, help="'+'-separated concepts")
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--seg_preset", type=str, default="sam-random",
                   choices=["heuristic", "sam-random", "sam"])
    p.add_argument("--sam_checkpoint", type=str, default=None,
                   help="segment-anything ViT-H checkpoint for --seg_preset sam")
    p.add_argument("--detector_dir", type=str, default=None,
                   help="HF-layout OWL-ViT detection dir for --seg_preset sam")
    p.add_argument("--box_threshold", type=float, default=0.20)
    p.add_argument("--detector", type=str, default="auto",
                   choices=["auto", "owlvit", "dino"],
                   help="box-detector backend for --seg_preset sam: OWL-ViT "
                        "(HF dir), the reference's GroundingDINO "
                        "(models/dino.py; accepts the shipped "
                        "groundingdino_swinb_cogcoor.pth), or sniff the "
                        "checkpoint (auto)")
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)
    os.makedirs(opt.output_path, exist_ok=True)

    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tweediemix_tpu.segmentation import make_segment_fn

    img = Image.open(opt.input_path).convert("RGB")
    arr = jnp.asarray(np.asarray(img, np.float32) / 255.0)

    seg = make_segment_fn(opt.text_condition, opt.output_path, opt.seg_preset,
                          sam_checkpoint=opt.sam_checkpoint,
                          detector_dir=opt.detector_dir,
                          box_threshold=opt.box_threshold,
                          detector=opt.detector)
    masks = seg(arr[None]) if opt.seg_preset == "heuristic" else seg(arr)

    for name, m in zip(opt.text_condition.split("+"), masks):
        out = Image.fromarray(np.asarray(m * 255.0, np.uint8))
        out.save(os.path.join(opt.output_path, f"{name}.jpg"))
        print(f"saved {os.path.join(opt.output_path, name + '.jpg')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
