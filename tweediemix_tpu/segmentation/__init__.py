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


def make_segment_fn(seg_concepts: str, output_path: str):
    raise NotImplementedError(
        "in-process text-guided segmentation model not yet available; "
        "pass precomputed masks via --mask_dir"
    )
