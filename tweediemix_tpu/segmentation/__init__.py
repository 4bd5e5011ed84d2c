"""Text-guided segmentation stage (the reference's ``text_segment/``).

The reference runs GroundingDINO + SAM in a subprocess on a second GPU and
round-trips mask JPGs (``fusion_generation/fusion_sampling.py:456-469``,
``text_segment/run_expand.py``). Here the stage is an in-process callable
returning image-resolution foreground masks; the rect-expand / blackout /
overlap post-processing is pure jnp (fusion/masks.py).

Presets: ``'sam'`` loads real converted weights (SAM ViT-H + OWL-ViT
detector) from local checkpoint paths; ``'sam-random'`` random-initializes
tiny models (tests/demos); ``'heuristic'`` is a weights-free fallback that
substitutes luminance-band masks — smoke runs only, NOT production quality.
"""

import os

from tweediemix_tpu.segmentation.expand import expand_masks  # noqa: F401
from tweediemix_tpu.segmentation.lang_sam import (  # noqa: F401
    HeuristicSegmenter,
    LangSAM,
    make_model_segment_fn,
)

# default local checkpoint locations for the real-weights preset
SAM_CHECKPOINT_ENV = "TWEEDIEMIX_SAM_CHECKPOINT"
DETECTOR_DIR_ENV = "TWEEDIEMIX_DETECTOR_DIR"


def make_segment_fn(seg_concepts: str, output_path: str, preset: str = "heuristic",
                    sam_checkpoint: str = None, detector_dir: str = None,
                    box_threshold: float = 0.20, detector: str = "auto"):
    """In-process segment_fn for the fusion sampler.

    ``preset='sam'`` loads converted SAM + detector weights from
    ``sam_checkpoint``/``detector_dir`` (or the ``TWEEDIEMIX_SAM_CHECKPOINT``
    / ``TWEEDIEMIX_DETECTOR_DIR`` env vars) — ``detector`` picks the box
    model: ``'owlvit'`` (HF dir), ``'dino'`` (the reference's GroundingDINO,
    models/dino.py; accepts groundingdino_swinb_cogcoor.pth), or ``'auto'``
    to sniff the checkpoint; ``'heuristic'`` is the
    weights-free fallback; ``'sam-random'`` random-initializes tiny models
    (tests/demos)."""
    concepts = seg_concepts.split("+")
    if preset == "heuristic":
        import sys

        print(
            "WARNING: --seg_preset heuristic substitutes luminance-band masks "
            "for real segmentation; use preset 'sam' with weights for quality.",
            file=sys.stderr,
        )
        return HeuristicSegmenter(len(concepts))
    if preset == "sam-random":
        import jax

        ls = LangSAM.random_init(jax.random.PRNGKey(0))
        return make_model_segment_fn(ls, seg_concepts)
    if preset == "sam":
        sam_checkpoint = sam_checkpoint or os.environ.get(SAM_CHECKPOINT_ENV)
        detector_dir = detector_dir or os.environ.get(DETECTOR_DIR_ENV)
        if not sam_checkpoint or not detector_dir:
            raise FileNotFoundError(
                "seg preset 'sam' needs --sam_checkpoint (segment-anything "
                "ViT-H .pth/safetensors) and --detector_dir (HF OWL-ViT dir), "
                f"or the {SAM_CHECKPOINT_ENV}/{DETECTOR_DIR_ENV} env vars"
            )
        ls = LangSAM.from_pretrained(sam_checkpoint, detector_dir,
                                     box_threshold=box_threshold,
                                     detector=detector)
        return make_model_segment_fn(ls, seg_concepts)
    raise ValueError(
        f"unknown segment preset {preset!r}; use 'sam', 'sam-random', "
        "'heuristic', or --mask_dir"
    )
