"""Tests for region-mask ops against a straightforward numpy re-derivation
of text_segment/run_expand.py:43-81 and fusion_sampling.py:81-89,461-469."""

import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.fusion.masks import (
    background_mask,
    binarize_and_resize_mask,
    build_region_masks,
    rect_expand,
    resolve_overlap_pair,
    sequential_blackout,
)


def np_rect_expand(mask):
    out = np.zeros_like(mask)
    nz = np.nonzero(mask)
    if len(nz[0]) == 0:
        return out
    out[nz[0].min() : nz[0].max() + 1, nz[1].min() : nz[1].max() + 1] = 1
    return out


def test_rect_expand_matches_numpy():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(16, 16) > 0.8).astype(np.float32)
        got = np.asarray(rect_expand(jnp.asarray(m)))
        np.testing.assert_array_equal(got, np_rect_expand(m))


def test_rect_expand_empty():
    m = jnp.zeros((8, 8))
    assert float(jnp.sum(rect_expand(m))) == 0.0


def test_binarize_and_resize():
    m = jnp.array([[0.2, 0.7], [0.9, 0.4]])
    out = np.asarray(binarize_and_resize_mask(m, 4, 4))
    assert out.shape == (4, 4)
    assert set(np.unique(out)) <= {0.0, 1.0}
    # top-left quadrant came from 0.2 → 0
    assert out[0, 0] == 0.0 and out[0, 3] == 1.0 and out[3, 0] == 1.0


def test_background_clamped():
    fg = jnp.stack([jnp.ones((4, 4)), jnp.ones((4, 4))])
    bg = np.asarray(background_mask(fg))
    assert np.all(bg == 0.0)  # 1 - 2 clamped to 0


def test_build_region_masks_layout():
    fg = jnp.zeros((2, 8, 8)).at[0, :4].set(1.0).at[1, 4:].set(1.0)
    masks = np.asarray(build_region_masks(fg, 4, 4))
    assert masks.shape == (3, 4, 4)
    # fg partition is exact → bg all zero; sum over concepts == 1 everywhere
    np.testing.assert_allclose(masks.sum(axis=0), 1.0)


def test_sequential_blackout():
    img = jnp.ones((4, 4, 3))
    m = jnp.zeros((4, 4)).at[1:3, 1:3].set(1.0)
    out = np.asarray(sequential_blackout(img, m))
    assert np.all(out[1:3, 1:3] == 0) and np.all(out[0, 0] == 1)


def np_resolve_overlap(rect0, rect1, orig0, orig1, thr=0.8):
    overlap = ((rect0 > 0) & (rect1 > 0)).astype(rect0.dtype)
    if not overlap.any():
        return rect0, rect1
    nz = np.nonzero(overlap)
    ys, xs = nz
    min_y, max_y, min_x, max_x = ys.min(), ys.max(), xs.min(), xs.max()
    ov0 = overlap * orig0
    ov1 = overlap * orig1
    if ov0.sum() / max(orig0.sum(), 1e-6) > thr:
        ov1 = np.zeros_like(ov1)
    r0, r1 = rect0.copy(), rect1.copy()
    r0[min_y : max_y + 1, min_x : max_x + 1] = ov0[min_y : max_y + 1, min_x : max_x + 1]
    r1[min_y : max_y + 1, min_x : max_x + 1] = ov1[min_y : max_y + 1, min_x : max_x + 1]
    return r0, r1


def test_resolve_overlap_matches_numpy():
    rng = np.random.RandomState(1)
    for trial in range(8):
        orig0 = (rng.rand(12, 12) > 0.7).astype(np.float32)
        orig1 = (rng.rand(12, 12) > 0.7).astype(np.float32)
        rect0 = np_rect_expand(orig0)
        rect1 = np_rect_expand(orig1)
        want0, want1 = np_resolve_overlap(rect0, rect1, orig0, orig1)
        got0, got1 = resolve_overlap_pair(
            jnp.asarray(rect0), jnp.asarray(rect1), jnp.asarray(orig0), jnp.asarray(orig1)
        )
        np.testing.assert_array_equal(np.asarray(got0), want0, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(got1), want1, err_msg=f"trial {trial}")


def test_resolve_overlap_containment_rule():
    # orig0 fully inside the overlap → concept 1 loses its claim there
    orig0 = np.zeros((8, 8), np.float32)
    orig0[2:4, 2:4] = 1
    orig1 = np.zeros((8, 8), np.float32)
    orig1[1:6, 1:6] = 1
    rect0, rect1 = np_rect_expand(orig0), np_rect_expand(orig1)
    got0, got1 = resolve_overlap_pair(
        jnp.asarray(rect0), jnp.asarray(rect1), jnp.asarray(orig0), jnp.asarray(orig1)
    )
    want0, want1 = np_resolve_overlap(rect0, rect1, orig0, orig1)
    np.testing.assert_array_equal(np.asarray(got0), want0)
    np.testing.assert_array_equal(np.asarray(got1), want1)
    # the overlap bbox region of concept 1 must be zeroed
    assert np.asarray(got1)[2:4, 2:4].sum() == 0
