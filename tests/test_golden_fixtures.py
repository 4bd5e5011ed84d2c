"""Golden-fixture tests against the reference repo's example outputs
(/root/reference/example_results — the reference's own de-facto regression
fixtures, SURVEY §4). These drive our mask pipeline with the REAL artifacts
the reference produced (tweedie preview + per-concept DINO/SAM masks)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = "/root/reference/example_results/test_out"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference example_results not mounted"
)


def load_gray(name):
    from PIL import Image

    return np.asarray(Image.open(os.path.join(FIXTURES, name)).convert("L"), np.float32) / 255.0


def test_region_masks_from_reference_masks():
    """preprocess_mask + bg complement on the actual cat/dog mask JPGs:
    binarized, latent-res, fg+bg forming a sub-partition (sum <= 1 after bg
    clamp, == 1 where fg masks don't overlap)."""
    from tweediemix_tpu.fusion.masks import build_region_masks

    cat = jnp.asarray(load_gray("a cat.jpg"))
    dog = jnp.asarray(load_gray("a dog.jpg"))
    h = w = 128  # 1024 // 8
    masks = np.asarray(build_region_masks(jnp.stack([cat, dog]), h, w))
    assert masks.shape == (3, h, w)
    assert set(np.unique(masks[:2])) <= {0.0, 1.0}
    # both concepts claim nonempty regions in the real fixture
    assert masks[0].sum() > 100 and masks[1].sum() > 100
    # bg = clamp(1 - sum(fg)): total is 1 wherever fg masks don't overlap
    total = masks.sum(axis=0)
    overlap = (masks[0] > 0) & (masks[1] > 0)
    np.testing.assert_allclose(total[~overlap], 1.0)
    assert float(total.min()) >= 1.0 - 1e-6


def test_rect_expand_on_reference_masks_contains_originals():
    from tweediemix_tpu.fusion.masks import rect_expand

    for name in ("a cat.jpg", "a dog.jpg"):
        m = jnp.asarray((load_gray(name) >= 0.5).astype(np.float32))
        r = np.asarray(rect_expand(m))
        # rectangle covers the mask and is a filled bbox
        assert np.all(r[np.asarray(m) > 0] == 1.0)
        ys, xs = np.nonzero(r)
        area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        assert r.sum() == area


def test_overlap_resolution_on_reference_masks_matches_numpy_mirror():
    """Full run_expand post-processing on the real fixture masks vs the
    independent numpy mirror from test_masks."""
    from tweediemix_tpu.fusion.masks import rect_expand, resolve_overlap_pair
    from tests.test_masks import np_rect_expand, np_resolve_overlap

    cat = (load_gray("cat.jpg") >= 0.5).astype(np.float32)
    dog = (load_gray("dog.jpg") >= 0.5).astype(np.float32)
    r0, r1 = np_rect_expand(cat), np_rect_expand(dog)
    want0, want1 = np_resolve_overlap(r0, r1, cat, dog)
    got0, got1 = resolve_overlap_pair(
        rect_expand(jnp.asarray(cat)), rect_expand(jnp.asarray(dog)),
        jnp.asarray(cat), jnp.asarray(dog),
    )
    np.testing.assert_array_equal(np.asarray(got0), want0)
    np.testing.assert_array_equal(np.asarray(got1), want1)


def test_tweedie_preview_through_mask_dir_cli(tmp_path):
    """Sample with the reference's own segmentation masks supplied via
    --mask_dir (the exact artifact handoff the reference uses)."""
    from tweediemix_tpu.cli.fusion_sampling import main

    out = tmp_path / "out"
    rc = main([
        "--model_preset", "tiny",
        "--prompt", "photo of a cat running, mountain background+photo of a dog running, mountain background+mountain background",
        "--prompt_orig", "photo of a cat and a dog running, mountain background",
        "--concepts", "cat+dog+mountain",
        "--modifier_token", "<cat1>+<dog1>+<mountain1>",
        "--seg_concepts", "a cat+a dog",
        "--mask_dir", FIXTURES,
        "--output_path", str(out),
        "--n_timesteps", "6", "--t_cond", "0.34",
        "--resampling_steps", "1", "--jumping_steps", "1",
        "--guidance_scale", "0.8",
        "--resolution_h", "128", "--resolution_w", "128",
        "--seed", "3821",
    ])
    assert rc == 0
    assert (out / "photo of a cat and a dog running, mountain background_3821.png").exists()
