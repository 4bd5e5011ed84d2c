"""Benchmark the in-process text-guided segmentation stage on one chip.

The reference pins GroundingDINO-SwinB + SAM-ViT-H to a *second GPU* and
round-trips mask JPGs through the filesystem mid-trajectory
(fusion_sampling.py:456-469). Here the whole detect→box→segment pass runs
in-process on the same chip; this tool measures what it costs per concept
prompt at real model scale (SAM ViT-H 1024px encoder + OWL-ViT base
detector, random weights — FLOPs identical to a real run).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_segment.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def measure() -> dict:
    """Run the segmentation-stage benchmark; returns
    {"metric", "ms_per_concept", "on_tpu"}. Full detect→box→segment
    predict (SAM ViT-H bf16 1024px encoder + OWL-ViT base detector,
    random weights — FLOPs identical to a real run); tiny configs on
    non-TPU backends so CI can execute it."""
    from tweediemix_tpu.segmentation.detector import DetectorConfig
    from tweediemix_tpu.segmentation.lang_sam import LangSAM
    from tweediemix_tpu.segmentation.sam import SAMConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        sam_cfg = SAMConfig.vit_h(dtype=jnp.bfloat16)
        det_cfg = DetectorConfig.owlvit_base_patch32()
    else:
        sam_cfg, det_cfg = SAMConfig.tiny(), DetectorConfig.tiny()

    ls = LangSAM.random_init(jax.random.PRNGKey(0), sam_cfg=sam_cfg, det_cfg=det_cfg)
    size = 1024 if on_tpu else 64
    img = jax.random.uniform(jax.random.PRNGKey(1), (size, size, 3))

    # one full predict (detect + SAM encode + per-box decode), per concept
    out = ls.predict(img, "a cat")
    sync(out[0])  # compile + warm
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = ls.predict(img, "a cat")
    sync(out[0])
    dt = (time.perf_counter() - t0) / n
    return {
        "metric": ("sam_vith_owlvit_1024_ms_per_concept" if on_tpu
                   else "seg_tiny_cpu_ms_per_concept"),
        "ms_per_concept": round(dt * 1e3, 1),
        "on_tpu": on_tpu,
    }


def main():
    print(f"backend={jax.default_backend()}")
    m = measure()
    dt = m["ms_per_concept"] / 1e3
    print(f"segment stage: {m['ms_per_concept']:.1f} ms per concept prompt")
    print(f"  (reference runs 2 extra models on a dedicated 2nd GPU; here the"
          f" whole boundary-step seg pass for 2 fg concepts costs ~{2*dt:.2f}s"
          f" once per image)")


if __name__ == "__main__":
    main()
