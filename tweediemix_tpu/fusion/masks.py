"""Region-mask construction and post-processing, as pure jnp ops.

The reference computes these in three places, all via the filesystem:

* ``fusion_generation/fusion_sampling.py:81-89`` (``preprocess_mask``):
  binarize a mask image at 0.5 and nearest-resize to latent resolution;
* ``fusion_sampling.py:461-469``: background = clamp(1 - sum(fg), 0);
* ``text_segment/run_expand.py:43-81``: rectangular bbox expansion of each
  concept mask, sequential black-out of claimed regions, and a pairwise
  overlap-resolution rule (inside the overlap bbox each concept keeps only
  its true mask pixels; if concept 0's mask is >80% contained in the
  overlap, concept 1's claim there is dropped).

Here every step is a static-shape jnp function so the whole mask pipeline
can run jitted on-device between the two sampling scans — no JPG
round-trips, masks stay in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binarize_and_resize_mask(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Binarize at 0.5 then nearest-resize to (h, w).

    ``mask`` is fp in [0, 1] of shape [H, W]. Mirrors ``preprocess_mask``
    (``fusion_sampling.py:81-89``).
    """
    binary = (mask >= 0.5).astype(jnp.float32)
    return jax.image.resize(binary, (h, w), method="nearest")


def background_mask(fg_masks: jnp.ndarray) -> jnp.ndarray:
    """bg = clamp(1 - sum(fg), min 0)  (``fusion_sampling.py:467-468``)."""
    bg = 1.0 - jnp.sum(fg_masks, axis=0)
    return jnp.maximum(bg, 0.0)


def build_region_masks(fg_masks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[N_fg, H, W] raw fg masks → [N_fg+1, h, w] latent-res masks + bg last.

    Matches the layout consumed by the fused phase
    (``fusion_sampling.py:461-469``): foreground concepts first, background
    (the last concept prompt) last.
    """
    resized = jax.vmap(lambda m: binarize_and_resize_mask(m, h, w))(fg_masks)
    bg = background_mask(resized)[None]
    return jnp.concatenate([resized, bg], axis=0)


def _bbox(mask: jnp.ndarray):
    """(min_y, max_y, min_x, max_x, any_nonzero) of a [H, W] >0 mask.

    Empty masks yield an inverted bbox plus ``any=False``; callers must gate
    on ``any``.
    """
    h, w = mask.shape
    nz = mask > 0
    rows = jnp.any(nz, axis=1)
    cols = jnp.any(nz, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0]
    big = jnp.int32(h + w)
    min_y = jnp.min(jnp.where(rows, ridx, big))
    max_y = jnp.max(jnp.where(rows, ridx, -1))
    min_x = jnp.min(jnp.where(cols, cidx, big))
    max_x = jnp.max(jnp.where(cols, cidx, -1))
    return min_y, max_y, min_x, max_x, jnp.any(nz)


def _box_region(h: int, w: int, min_y, max_y, min_x, max_x) -> jnp.ndarray:
    """Boolean [h, w] mask of the inclusive bbox region."""
    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (ridx >= min_y) & (ridx <= max_y) & (cidx >= min_x) & (cidx <= max_x)


def rect_expand(mask: jnp.ndarray) -> jnp.ndarray:
    """Expand a mask to its filled bounding rectangle.

    Mirrors ``run_expand.py:43-52``. Empty masks stay empty.
    """
    h, w = mask.shape
    min_y, max_y, min_x, max_x, has = _bbox(mask)
    rect = _box_region(h, w, min_y, max_y, min_x, max_x).astype(mask.dtype)
    return jnp.where(has, rect, jnp.zeros_like(rect))


def sequential_blackout(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero image pixels claimed by ``mask`` before segmenting the next
    concept (``run_expand.py:55-58``). image: [H, W, C], mask: [H, W]."""
    return jnp.where((mask > 0)[..., None], jnp.zeros_like(image), image)


def resolve_overlap_pair(
    rect0: jnp.ndarray,
    rect1: jnp.ndarray,
    orig0: jnp.ndarray,
    orig1: jnp.ndarray,
    containment_thr: float = 0.8,
):
    """Two-concept overlap resolution of ``run_expand.py:62-81``.

    Inside the bbox of ``rect0 & rect1`` each concept keeps only its true
    (non-rectangular) mask pixels; additionally, if >``containment_thr`` of
    ``orig0``'s area lies in the overlap, concept 1's claim there is zeroed.
    Returns the adjusted (rect0, rect1).
    """
    h, w = rect0.shape
    overlap = ((rect0 > 0) & (rect1 > 0)).astype(rect0.dtype)
    min_y, max_y, min_x, max_x, has = _bbox(overlap)
    box = _box_region(h, w, min_y, max_y, min_x, max_x)

    ov0 = overlap * orig0
    ov1 = overlap * orig1
    contained = jnp.sum(ov0) / jnp.maximum(jnp.sum(orig0), 1e-6)
    ov1 = jnp.where(contained > containment_thr, jnp.zeros_like(ov1), ov1)

    new0 = jnp.where(box, ov0, rect0)
    new1 = jnp.where(box, ov1, rect1)
    out0 = jnp.where(has, new0, rect0)
    out1 = jnp.where(has, new1, rect1)
    return out0, out1
