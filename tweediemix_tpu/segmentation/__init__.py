"""Text-guided segmentation stage (the reference's ``text_segment/``).

The reference runs GroundingDINO + SAM in a subprocess on a second GPU and
round-trips mask JPGs (``fusion_generation/fusion_sampling.py:456-469``,
``text_segment/run_expand.py``). Here the stage is an in-process callable
returning image-resolution foreground masks; the rect-expand / blackout /
overlap post-processing is pure jnp (fusion/masks.py).

The detect+segment models are being ported in a later milestone; until
then ``make_segment_fn`` raises so callers fall back to ``--mask_dir``.
"""

from tweediemix_tpu.segmentation.expand import expand_masks  # noqa: F401
from tweediemix_tpu.segmentation.lang_sam import (  # noqa: F401
    HeuristicSegmenter,
    LangSAM,
    make_model_segment_fn,
)


def make_segment_fn(seg_concepts: str, output_path: str, preset: str = "heuristic"):
    """In-process segment_fn for the fusion sampler.

    ``preset='sam'`` runs the LangSAM stage (needs weights or random init
    for smoke runs); ``'heuristic'`` is the weights-free fallback;
    ``'sam-random'`` random-initializes tiny models (tests/demos).
    """
    concepts = seg_concepts.split("+")
    if preset == "heuristic":
        return HeuristicSegmenter(len(concepts))
    if preset == "sam-random":
        import jax

        ls = LangSAM.random_init(jax.random.PRNGKey(0))
        return make_model_segment_fn(ls, seg_concepts)
    raise NotImplementedError(
        f"segment preset {preset!r}: converted detector/SAM weights land in "
        "a later round; use 'heuristic', 'sam-random', or --mask_dir"
    )
