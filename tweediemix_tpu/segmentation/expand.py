"""Mask expansion pipeline — the logic of ``text_segment/run_expand.py``
as a pure function over an injected predictor.

For each ``+``-separated concept: predict its mask, expand to the filled
bounding rectangle (``run_expand.py:43-52``), then black out the claimed
pixels before predicting the next concept (``:55-58``). For two concepts,
resolve rectangle overlap with the reference's containment rule
(``:62-81``).
"""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp

from tweediemix_tpu.fusion.masks import rect_expand, resolve_overlap_pair, sequential_blackout

# predict_fn(image [H,W,3] float [0,1], text: str) -> mask [H,W] float {0,1}
PredictFn = Callable[[jnp.ndarray, str], jnp.ndarray]


def expand_masks(predict_fn: PredictFn, image: jnp.ndarray, concepts: List[str]) -> jnp.ndarray:
    """Returns [N_concepts, H, W] rectangular-expanded, overlap-resolved masks."""
    rects, origs = [], []
    img = image
    for concept in concepts:
        mask = predict_fn(img, concept)
        origs.append(mask)
        rects.append(rect_expand(mask))
        img = sequential_blackout(img, mask)

    if len(rects) == 2:
        r0, r1 = resolve_overlap_pair(rects[0], rects[1], origs[0], origs[1])
        rects = [r0, r1]
    return jnp.stack(rects)
