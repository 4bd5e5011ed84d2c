"""Training subsystem tests: native augmentation kernel, dataset semantics,
train-step selectivity (only trainable leaves move), delta checkpoint
roundtrip, and a train→sample end-to-end smoke via both CLIs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tweediemix_tpu.native.build import _paste_augment_np, get_augment_lib, paste_augment


def test_native_kernel_matches_numpy():
    rng = np.random.RandomState(0)
    for trial in range(4):
        ih, iw = rng.randint(20, 80), rng.randint(20, 80)
        img = rng.randint(0, 255, (ih, iw, 3), np.uint8)
        th, tw = rng.randint(8, 64), rng.randint(8, 64)
        size = 128
        oy = rng.randint(0, size - th + 1)
        ox = rng.randint(0, size - tw + 1)
        a, ma = paste_augment(img, th, tw, oy, ox, size, size // 8)
        b, mb = _paste_augment_np(img, th, tw, oy, ox, size, size // 8)
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(ma, mb)


def test_native_kernel_built():
    # g++ is in this image; the C++ path must actually be exercised
    assert get_augment_lib() is not None


def test_mask_semantics():
    """Mask covers the paste footprint shrunk by 1 latent px per side
    (diffusers_data_pipeline_xl.py:175-176)."""
    img = np.full((64, 64, 3), 255, np.uint8)
    size = 128
    canvas, mask = paste_augment(img, 64, 64, 16, 32, size, size // 8)
    want = np.zeros((16, 16), np.float32)
    want[16 // 8 + 1 : (16 + 64) // 8 - 1, 32 // 8 + 1 : (32 + 64) // 8 - 1] = 1.0
    np.testing.assert_array_equal(mask, want)
    # canvas is black outside the paste, image inside, normalized to [-1,1]
    assert canvas[0, 0, 0] == -1.0
    np.testing.assert_allclose(canvas[16 + 5, 32 + 5], 1.0, atol=1e-2)


def test_resize_crop_normalize_matches_numpy():
    from tweediemix_tpu.native.build import _bilinear_np, resize_crop_normalize, resized_dims

    rng = np.random.RandomState(1)
    for ih, iw, size, cy, cx in [(96, 80, 64, 3, 0), (64, 192, 64, 0, 40), (50, 50, 64, 0, 0)]:
        img = rng.randint(0, 255, (ih, iw, 3), np.uint8)
        got = resize_crop_normalize(img, size, cy, cx)
        th, tw = resized_dims(ih, iw, size)
        cy2, cx2 = min(cy, th - size), min(cx, tw - size)
        want = (_bilinear_np(img, th, tw)[cy2:cy2 + size, cx2:cx2 + size]
                / 127.5 - 1.0).astype(np.float32)
        assert got.shape == (size, size, 3)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_resized_dims_truncates_like_torchvision():
    """torchvision Resize(int) computes the long side as
    int(size * long / short) — truncation, not rounding
    (torchvision _compute_resized_output_size). 96x127 at size=64:
    64*127/96 = 84.67 → 84, where round() would give 85."""
    from tweediemix_tpu.native.build import resized_dims

    assert resized_dims(96, 127, 64) == (64, 84)
    assert resized_dims(127, 96, 64) == (84, 64)
    assert resized_dims(50, 50, 64) == (64, 64)
    # long side can never truncate below `size` (long >= short)
    assert resized_dims(97, 96, 64) == (int(64 * 97 / 96), 64)


def test_class_transform_preserves_aspect_and_center_crops(image_dirs, tmp_path):
    """The reference class transform is shorter-side Resize + crop
    (diffusers_data_pipeline_xl.py:120-128), NOT a squash to size². A wide
    image whose middle square is white must center-crop to all-white."""
    from PIL import Image

    from tweediemix_tpu.training.data import ConceptSpec, CustomDiffusionDataset
    from tweediemix_tpu.utils.tokenizer import HashTokenizer

    inst, _ = image_dirs
    cls = tmp_path / "wide_cls"
    cls.mkdir()
    wide = np.zeros((64, 192, 3), np.uint8)
    wide[:, 64:128] = 255
    Image.fromarray(wide).save(cls / "0.png")

    ds = CustomDiffusionDataset(
        [ConceptSpec(inst, "a <new1> cat", str(cls), "a cat")],
        HashTokenizer(), HashTokenizer(), size=64,
        with_prior_preservation=True, center_crop=True, seed=0,
    )
    row = ds.example(0)
    np.testing.assert_allclose(row["class_pixel_values"], 1.0, atol=1e-2)
    # random crop (center_crop=False) stays within the resized bounds and in range
    ds2 = CustomDiffusionDataset(
        [ConceptSpec(inst, "a <new1> cat", str(cls), "a cat")],
        HashTokenizer(), HashTokenizer(), size=64,
        with_prior_preservation=True, center_crop=False, seed=3,
    )
    vals = ds2.example(0)["class_pixel_values"]
    assert vals.shape == (64, 64, 3)
    assert vals.min() >= -1.0 and vals.max() <= 1.0
    # every random-crop column is a full-height slice of the source: each
    # column is uniformly black or white, never a blend
    col_means = vals.mean(axis=(0, 2))
    assert np.all((np.abs(col_means - 1.0) < 2e-2) | (np.abs(col_means + 1.0) < 2e-2))


@pytest.fixture
def image_dirs(tmp_path):
    from PIL import Image

    inst = tmp_path / "inst"
    cls = tmp_path / "cls"
    inst.mkdir()
    cls.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (96, 80, 3), np.uint8)).save(inst / f"{i}.png")
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(cls / f"{i}.png")
    return str(inst), str(cls)


def test_dataset_collate_layout(image_dirs):
    from tweediemix_tpu.training.data import ConceptSpec, CustomDiffusionDataset
    from tweediemix_tpu.utils.tokenizer import HashTokenizer

    inst, cls = image_dirs
    ds = CustomDiffusionDataset(
        [ConceptSpec(inst, "photo of a <new1> cat", cls, "photo of a cat")],
        HashTokenizer(), HashTokenizer(), size=64,
        with_prior_preservation=True, seed=0,
    )
    batch = next(ds.batches(2, 1))
    assert batch["pixel_values"].shape == (4, 64, 64, 3)  # 2 instance + 2 prior
    assert batch["mask"].shape == (4, 8, 8, 1)
    assert batch["ids_one"].shape == (4, 77)
    np.testing.assert_array_equal(batch["is_prior"], [0, 0, 1, 1])
    # prior rows have all-ones masks
    np.testing.assert_array_equal(batch["mask"][2:], 1.0)
    assert batch["pixel_values"].min() >= -1.0 and batch["pixel_values"].max() <= 1.0


def test_train_step_only_moves_trainable_leaves():
    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import TrainConfig
    from tweediemix_tpu.training.trainer import (
        FullTrainState,
        embedding_row_mask,
        full_trainable_mask,
        make_full_optimizer,
        make_full_train_step,
        trainable_subset,
    )

    key = jax.random.PRNGKey(0)
    c1 = CLIPTextConfig.tiny()
    c2 = CLIPTextConfig.tiny(projection_dim=32)
    ucfg = UNetConfig.micro(cross_attention_dim=64, pooled_projection_dim=32,
                            detach_first_token_kv=True)
    unet = UNet2DConditionModel(ucfg)
    te1, te2 = CLIPTextModel(c1), CLIPTextModel(c2)
    h = 8
    ids = jnp.zeros((2, 77), jnp.int32).at[:, 5].set(999)
    params = {
        "unet": jax.jit(unet.init)(
            key, jnp.zeros((2, h, h, 4)), jnp.int32(1), jnp.zeros((2, 77, 64)),
            jnp.zeros((2, 32)), jnp.zeros((2, 6)))["params"],
        "te1": jax.jit(te1.init)(key, ids)["params"],
        "te2": jax.jit(te2.init)(jax.random.fold_in(key, 1), ids)["params"],
    }
    cfg = TrainConfig(learning_rate=1e-3, with_prior_preservation=True)
    mask = full_trainable_mask(params, "crossattn_kv", True)
    opt = make_full_optimizer(cfg, mask)
    rm1 = embedding_row_mask(c1.vocab_size, [7])
    rm2 = embedding_row_mask(c2.vocab_size, [7])
    tids = jnp.array([[64, 64, 0, 0, 64, 64]], jnp.float32)
    step = jax.jit(make_full_train_step(
        unet, te1, te2, cfg, training_alphas_cumprod(), opt, rm1, rm2, tids,
        mask=mask))

    batch = {
        "latents": jax.random.normal(key, (4, h, h, 4)),
        "mask": jnp.ones((4, h, h, 1)),
        "ids_one": jnp.tile(ids, (2, 1)).at[:, 2].set(7),
        "ids_two": jnp.tile(ids, (2, 1)).at[:, 2].set(7),
        "is_prior": jnp.array([0.0, 0.0, 1.0, 1.0]),
    }
    state = FullTrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt.init(trainable_subset(params, mask)))
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert "prior_loss" in metrics

    flat0 = traverse_util.flatten_dict(params)
    flat1 = traverse_util.flatten_dict(state2.params)
    flat_m = traverse_util.flatten_dict(mask)
    moved = {p: float(jnp.max(jnp.abs(flat1[p] - flat0[p]))) for p in flat0}
    for p, on in flat_m.items():
        if on and p[-1] != "embedding":
            assert moved[p] > 0, f"trainable leaf did not move: {p}"
        if not on:
            assert moved[p] == 0, f"frozen leaf moved: {p}"
    # embedding tables: only row 7 (modifier) moves
    for te in ("te1", "te2"):
        emb0 = np.asarray(flat0[(te, "token_embedding", "embedding")])
        emb1 = np.asarray(flat1[(te, "token_embedding", "embedding")])
        diff = np.abs(emb1 - emb0).max(axis=1)
        assert diff[7] > 0
        others = np.delete(diff, 7)
        np.testing.assert_allclose(others, 0, atol=2e-5)  # wd-only drift


def test_train_text_encoder_full_towers(tmp_path):
    """--train_text_encoder: whole text towers train (reference
    diffusers_training_xl_new.py:301,865-869), modifier-row grad masking
    still applies, and the delta checkpoint gains reference-schema
    'text_encoder'/'text_encoder_2' state dicts (:52-53) that roundtrip."""
    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import TrainConfig
    from tweediemix_tpu.training.trainer import (
        FullTrainState,
        embedding_row_mask,
        full_trainable_mask,
        make_full_optimizer,
        make_full_train_step,
        save_delta_checkpoint,
        trainable_subset,
    )

    key = jax.random.PRNGKey(0)
    c1 = CLIPTextConfig.tiny()
    c2 = CLIPTextConfig.tiny(projection_dim=32)
    ucfg = UNetConfig.micro(cross_attention_dim=64, pooled_projection_dim=32,
                            detach_first_token_kv=True)
    unet = UNet2DConditionModel(ucfg)
    te1, te2 = CLIPTextModel(c1), CLIPTextModel(c2)
    h = 8
    ids = jnp.zeros((2, 77), jnp.int32).at[:, 5].set(999)
    params = {
        "unet": jax.jit(unet.init)(
            key, jnp.zeros((2, h, h, 4)), jnp.int32(1), jnp.zeros((2, 77, 64)),
            jnp.zeros((2, 32)), jnp.zeros((2, 6)))["params"],
        "te1": jax.jit(te1.init)(key, ids)["params"],
        "te2": jax.jit(te2.init)(jax.random.fold_in(key, 1), ids)["params"],
    }
    cfg = TrainConfig(learning_rate=1e-3)
    mask = full_trainable_mask(params, "crossattn_kv", True,
                               train_text_encoder=True)
    # every text-tower leaf is trainable
    for te in ("te1", "te2"):
        assert all(traverse_util.flatten_dict(mask[te]).values())
    opt = make_full_optimizer(cfg, mask)
    rm1 = embedding_row_mask(c1.vocab_size, [7])
    rm2 = embedding_row_mask(c2.vocab_size, [7])
    tids = jnp.array([[64, 64, 0, 0, 64, 64]], jnp.float32)
    step = jax.jit(make_full_train_step(
        unet, te1, te2, cfg, training_alphas_cumprod(), opt, rm1, rm2, tids,
        mask=mask))
    batch = {
        "latents": jax.random.normal(key, (2, h, h, 4)),
        "mask": jnp.ones((2, h, h, 1)),
        "ids_one": ids.at[:, 2].set(7),
        "ids_two": ids.at[:, 2].set(7),
        "is_prior": jnp.zeros((2,)),
    }
    state = FullTrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt.init(trainable_subset(params, mask)))
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(metrics["loss"]))

    flat0 = traverse_util.flatten_dict(params)
    flat1 = traverse_util.flatten_dict(state2.params)
    # encoder-layer weights (not just embeddings) moved in both towers
    for te in ("te1", "te2"):
        p = (te, "layers_0", "fc1", "kernel")
        assert float(jnp.max(jnp.abs(flat1[p] - flat0[p]))) > 0
        # modifier-row masking still applies: row 7 moves by gradient,
        # other rows only by weight decay (tiny)
        emb0 = np.asarray(flat0[(te, "token_embedding", "embedding")])
        emb1 = np.asarray(flat1[(te, "token_embedding", "embedding")])
        diff = np.abs(emb1 - emb0).max(axis=1)
        assert diff[7] > 0
        np.testing.assert_allclose(np.delete(diff, 7), 0, atol=2e-5)

    # checkpoint roundtrip with the text-encoder state dicts
    from tweediemix_tpu.concepts.delta import load_reference_delta

    f = str(tmp_path / "delta-1.bin")
    save_delta_checkpoint(f, state2, mask, ["<a>"], [7], [7],
                          save_text_encoder=True)
    st = load_reference_delta(f)
    for key_, te in (("text_encoder", "te1"), ("text_encoder_2", "te2")):
        assert key_ in st
        got = traverse_util.flatten_dict(st[key_])
        want = traverse_util.flatten_dict(state2.params[te])
        assert set(got) == set(want)
        for p in want:
            np.testing.assert_allclose(np.asarray(got[p]), np.asarray(want[p]),
                                       rtol=1e-6, atol=1e-6, err_msg=str(p))


def test_delta_checkpoint_roundtrip(tmp_path):
    from tweediemix_tpu.concepts.delta import (
        flax_path_to_torch_name,
        load_reference_delta,
        save_reference_delta,
        torch_name_to_flax_path,
    )

    path = (
        "down_blocks_1_attentions_0", "transformer_blocks_2", "attn2", "to_k", "kernel"
    )
    tname = flax_path_to_torch_name(path)
    assert tname == "down_blocks.1.attentions.0.transformer_blocks.2.attn2.to_k.weight"
    assert torch_name_to_flax_path(tname) == path

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    f = str(tmp_path / "delta-1.bin")
    save_reference_delta(
        f, {path: arr}, {"<new1>": np.ones(8, np.float32)}, {"<new1>": np.zeros(6, np.float32)}
    )
    back = load_reference_delta(f)
    np.testing.assert_allclose(back["unet"][path], arr)
    np.testing.assert_allclose(back["modifier_token"]["<new1>"], 1.0)
    assert back["modifier_token_2"]["<new1>"].shape == (6,)


@pytest.mark.parametrize("train_text_encoder", [False, True])
def test_train_then_sample_cli_end_to_end(tmp_path, image_dirs, train_text_encoder):
    """Full product circle: tiny training writes a delta checkpoint that the
    fusion sampling CLI consumes. The --train_text_encoder variant checks
    the whole-tower checkpoint entries load through the sampling side
    (reference load_model's load_state_dict path)."""
    from PIL import Image

    from tweediemix_tpu.cli.fusion_sampling import main as sample_main
    from tweediemix_tpu.cli.train import main as train_main

    inst, cls = image_dirs
    out = tmp_path / "ckpt"
    rc = train_main([
        "--model_preset", "tiny",
        "--instance_data_dir", inst,
        "--instance_prompt", "photo of a <new1> cat",
        "--class_data_dir", cls,
        "--class_prompt", "photo of a cat",
        "--with_prior_preservation",
        "--modifier_token", "<new1>",
        "--resolution", "64",
        "--max_train_steps", "3",
        "--save_steps", "100",
        "--output_dir", str(out),
        "--learning_rate", "1e-4",
        "--dp_devices", "1",  # keep the 1-core-CPU smoke run small
    ] + (["--train_text_encoder"] if train_text_encoder else []))
    assert rc == 0
    ckpts = sorted(out.glob("delta-*.bin"))
    assert ckpts, list(out.iterdir())

    # masks for the sampling side
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    m = np.zeros((16, 16), np.uint8)
    m[:, :8] = 255
    Image.fromarray(m).save(mask_dir / "a cat.jpg")
    Image.fromarray(255 - m).save(mask_dir / "a dog.jpg")

    sample_out = tmp_path / "sample_out"
    rc = sample_main([
        "--model_preset", "tiny",
        "--personal_checkpoint", f"{ckpts[-1]}+{ckpts[-1]}+{ckpts[-1]}",
        "--prompt", "photo of a cat running+photo of a dog running+mountain background",
        "--prompt_orig", "photo of a cat and a dog",
        "--concepts", "cat+dog+mountain",
        "--modifier_token", "<new1>+<new2>+<new3>",
        "--seg_concepts", "a cat+a dog",
        "--mask_dir", str(mask_dir),
        "--output_path", str(sample_out),
        "--n_timesteps", "4", "--t_cond", "0.5",
        "--resampling_steps", "0", "--jumping_steps", "0",
        "--resolution_h", "128", "--resolution_w", "128",
    ])
    assert rc == 0
    assert list(sample_out.glob("*.png"))


def test_cli_train_dp_matches_single_device(tmp_path, image_dirs):
    """The same global batch trained data-parallel over 2 virtual devices
    produces the same delta checkpoint as a single-device run (the
    accelerate-DDP equivalence, diffusers_training_xl_new.py:913-920)."""
    from tweediemix_tpu.cli.train import main as train_main
    from tweediemix_tpu.concepts.delta import load_reference_delta

    inst, _ = image_dirs
    common = [
        "--model_preset", "tiny",
        "--instance_data_dir", inst,
        "--instance_prompt", "photo of a <new1> cat",
        "--modifier_token", "<new1>",
        "--resolution", "64",
        "--max_train_steps", "2",
        "--save_steps", "100",
        "--learning_rate", "0.05",
        "--seed", "7",
    ]
    out1, out2 = tmp_path / "single", tmp_path / "dp"
    assert train_main(common + ["--output_dir", str(out1),
                                "--dp_devices", "1", "--train_batch_size", "2"]) == 0
    assert train_main(common + ["--output_dir", str(out2),
                                "--dp_devices", "2", "--train_batch_size", "1"]) == 0

    d1 = load_reference_delta(str(sorted(out1.glob("delta-*.bin"))[-1]))
    d2 = load_reference_delta(str(sorted(out2.glob("delta-*.bin"))[-1]))
    assert set(d1["unet"]) == set(d2["unet"]) and d1["unet"]
    for k in d1["unet"]:
        np.testing.assert_allclose(
            np.asarray(d1["unet"][k]), np.asarray(d2["unet"][k]),
            atol=1e-4, rtol=1e-3, err_msg=k,
        )
    for field in ("modifier_token", "modifier_token_2"):
        for tok in d1.get(field, {}):
            np.testing.assert_allclose(
                np.asarray(d1[field][tok]), np.asarray(d2[field][tok]),
                atol=1e-4, rtol=1e-3, err_msg=f"{field}/{tok}",
            )


def test_unet_remat_grads_match():
    """remat=True must not change values — same loss and grads as the
    plain UNet (the --gradient_checkpointing path)."""
    import jax
    import jax.numpy as jnp

    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    key = jax.random.PRNGKey(0)
    args = (
        jax.random.normal(key, (2, 8, 8, 4)),
        jnp.int32(3),
        0.1 * jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 32)),
        0.1 * jax.random.normal(jax.random.fold_in(key, 2), (2, 32)),
        jnp.zeros((2, 6)),
    )
    base = UNet2DConditionModel(UNetConfig.micro())
    rem = UNet2DConditionModel(UNetConfig.micro(remat=True))
    params = jax.jit(base.init)(key, *args)["params"]

    def loss(model):
        return lambda p: jnp.sum(model.apply({"params": p}, *args) ** 2)

    l1, g1 = jax.value_and_grad(loss(base))(params)
    l2, g2 = jax.value_and_grad(loss(rem))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    from flax import traverse_util

    flat1 = traverse_util.flatten_dict(g1)
    flat2 = traverse_util.flatten_dict(g2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        # remat reorders fp32 reductions; compare against the leaf's scale
        d = float(jnp.max(jnp.abs(flat1[k] - flat2[k])))
        scale = float(jnp.max(jnp.abs(flat1[k])))
        assert d <= 1e-6 + 1e-4 * scale, ("/".join(k), d, scale)


def test_class_image_generation(tmp_path):
    """generate_class_images writes decodable PNGs (reference
    diffusers_training_xl_new.py:561-600 path)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.training.class_gen import generate_class_images

    cfg = UNetConfig.micro()
    unet = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    h = 8
    params = jax.jit(unet.init)(
        key, jnp.zeros((2, h, h, 4)), jnp.int32(1),
        jnp.zeros((2, 8, cfg.cross_attention_dim)),
        jnp.zeros((2, cfg.pooled_projection_dim)), jnp.zeros((2, 6)),
    )["params"]
    tids = jnp.array([[64, 64, 0, 0, 64, 64]], jnp.float32)

    def unet_fn(p, x, t, cx, pl, idx):
        return unet.apply({"params": p}, x, t, cx, pl, jnp.tile(tids, (x.shape[0], 1)), idx)

    ctx2 = 0.1 * jax.random.normal(key, (2, 8, cfg.cross_attention_dim))
    pool2 = 0.1 * jax.random.normal(key, (2, cfg.pooled_projection_dim))
    decode = lambda x: jnp.clip(jnp.tile(x[..., :3], (1, 4, 4, 1)) * 0.5 + 0.5, 0, 1)

    out = tmp_path / "cls"
    n = generate_class_images(str(out), 3, ctx2, pool2, unet_fn, params, decode,
                              (h, h), n_steps=4, guidance_scale=6.0, batch=2)
    assert n == 3
    files = sorted(out.glob("*.png"))
    assert len(files) == 3
    assert Image.open(files[0]).size == (32, 32)


# ---------------------------------------------------------------------------
# 8-bit Adam (bitsandbytes AdamW8bit equivalent)


def test_quantize_blockwise_roundtrip():
    from tweediemix_tpu.training.adam8bit import (
        dequantize_blockwise, quantize_blockwise)

    x = jax.random.normal(jax.random.PRNGKey(0), (13, 77)) * 3.0
    q, scale = quantize_blockwise(x)
    assert q.dtype == jnp.int8
    y = dequantize_blockwise(q, scale, x.shape)
    # linear absmax code: error bounded by scale/2 per block
    err = jnp.abs(y - x)
    bound = jnp.max(jnp.abs(x)) / 127.0
    assert float(jnp.max(err)) <= float(bound) / 2 + 1e-7
    # zeros stay exactly zero
    qz, sz = quantize_blockwise(jnp.zeros((100,)))
    assert float(jnp.abs(dequantize_blockwise(qz, sz, (100,))).max()) == 0.0


def test_adam8bit_matches_fp32_adam():
    """int8-state AdamW tracks fp32 AdamW on a small least-squares problem."""
    import optax

    from tweediemix_tpu.training.adam8bit import adamw8bit

    key = jax.random.PRNGKey(1)
    d = 256  # realistic tensor size: blockwise int8 state targets big tensors
    a = jax.random.normal(key, (512, d)) / jnp.sqrt(d)
    target = jax.random.normal(jax.random.fold_in(key, 1), (512,))

    def loss(w):
        return jnp.mean((a @ w - target) ** 2)

    results = {}
    for name, opt in [
        ("fp32", optax.adamw(3e-2)),
        ("int8", adamw8bit(3e-2)),
    ]:
        w = jnp.zeros((d,))
        state = opt.init(w)

        @jax.jit
        def step(w, state, opt=opt):
            g = jax.grad(loss)(w)
            upd, state = opt.update(g, state, w)
            return optax.apply_updates(w, upd), state

        for _ in range(150):
            w, state = step(w, state)
        results[name] = float(loss(w))

    init = float(loss(jnp.zeros((d,))))
    # (the overdetermined system has an irreducible residual ~0.47*init)
    assert results["fp32"] < 0.6 * init
    # int8 state converges like fp32 (quantization noise, not divergence)
    assert results["int8"] < results["fp32"] + 0.02 * init


def test_train_step_with_8bit_adam():
    """One CD train step with use_8bit_adam: runs, finite loss, int8 state."""
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import (
        TrainConfig,
        init_state,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )

    key = jax.random.PRNGKey(0)
    ucfg = UNetConfig.micro()
    model = UNet2DConditionModel(ucfg)
    h = 8
    batch = {
        "latents": jax.random.normal(key, (2, h, h, 4)),
        "mask": jnp.ones((2, h, h, 1)),
        "ctx": 0.1 * jax.random.normal(key, (2, 16, ucfg.cross_attention_dim)),
        "pooled": 0.1 * jax.random.normal(key, (2, ucfg.pooled_projection_dim)),
        "time_ids": jnp.tile(jnp.array([[64, 64, 0, 0, 64, 64]], jnp.float32), (2, 1)),
        "is_prior": jnp.array([0.0, 1.0]),
    }
    params = jax.jit(model.init)(
        key, batch["latents"], jnp.int32(1), batch["ctx"], batch["pooled"],
        batch["time_ids"],
    )["params"]
    cfg = TrainConfig(use_8bit_adam=True, with_prior_preservation=True)
    mask = trainable_mask(params, cfg.freeze_model)
    opt = make_optimizer(cfg, mask)
    state = init_state(params, opt)
    step = jax.jit(make_train_step(model, cfg, training_alphas_cumprod(), opt))
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["loss"]))
    # the persisted moment state must be int8
    leaves = jax.tree.leaves(state2.opt_state)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves)


def test_full_optimizer_8bit_state():
    """The CLI's optimizer path (make_full_optimizer) honors use_8bit_adam."""
    from tweediemix_tpu.training.custom_diffusion import TrainConfig
    from tweediemix_tpu.training.trainer import make_full_optimizer

    cfg = TrainConfig(use_8bit_adam=True)
    opt = make_full_optimizer(cfg, mask=None)
    params = {"w": jnp.zeros((300,))}
    state = opt.init(params)
    leaves = jax.tree.leaves(state)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves)
    g = {"w": jnp.ones((300,)) * 0.1}
    upd, state2 = opt.update(g, state, params)
    assert bool(jnp.isfinite(upd["w"]).all())


def test_cli_train_concepts_list_json(tmp_path, image_dirs):
    """--concepts_list JSON (the reference's multi-concept config,
    diffusers_training_xl_new.py:431-436,534-545) drives the tiny trainer."""
    import json as _json

    from tweediemix_tpu.cli.train import main as train_main

    inst, cls = image_dirs
    spec = [
        {"instance_data_dir": inst, "instance_prompt": "photo of a <a1> cat",
         "class_data_dir": cls, "class_prompt": "photo of a cat"},
        {"instance_data_dir": inst, "instance_prompt": "photo of a <b1> dog",
         "class_data_dir": cls, "class_prompt": "photo of a dog"},
    ]
    cfg = tmp_path / "concepts.json"
    cfg.write_text(_json.dumps(spec))
    out = tmp_path / "ckpt"
    rc = train_main([
        "--model_preset", "tiny",
        "--resolution", "64",
        "--concepts_list", str(cfg),
        "--with_prior_preservation",
        "--modifier_token", "<a1>+<b1>",
        "--max_train_steps", "2",
        "--save_steps", "2",
        "--output_dir", str(out),
    ])
    assert rc == 0
    ckpts = list(out.glob("delta-*.bin"))
    assert ckpts, list(out.iterdir())
    from tweediemix_tpu.concepts.delta import load_reference_delta

    delta = load_reference_delta(str(ckpts[0]))
    assert "<a1>" in delta["modifier_token"] and "<b1>" in delta["modifier_token"]


def test_prefetch_batches_order_and_errors():
    """prefetch_batches preserves order, drains fully, and re-raises
    worker exceptions at the consumer."""
    from tweediemix_tpu.training.data import prefetch_batches

    assert list(prefetch_batches(iter(range(7)), depth=2)) == list(range(7))

    def boom():
        yield 0
        yield 1
        raise ValueError("decode failed")

    got = []
    with pytest.raises(ValueError, match="decode failed"):
        for x in prefetch_batches(boom(), depth=1):
            got.append(x)
    assert got == [0, 1]


def test_cli_train_vae_encode_bf16(tmp_path, image_dirs):
    """--vae_encode_dtype bf16 runs the tiny trainer and saves a loadable
    delta (latents are cast back to fp32 at the boundary)."""
    from tweediemix_tpu.cli.train import main as train_main

    inst, _ = image_dirs
    out = tmp_path / "ckpt"
    rc = train_main([
        "--model_preset", "tiny",
        "--resolution", "64",
        "--instance_data_dir", inst,
        "--instance_prompt", "photo of a <v1> cat",
        "--modifier_token", "<v1>",
        "--max_train_steps", "2",
        "--save_steps", "2",
        "--vae_encode_dtype", "bf16",
        "--output_dir", str(out),
    ])
    assert rc == 0
    assert list(out.glob("delta-*.bin"))


def test_cli_train_crops_coords_flags(tmp_path, image_dirs):
    """--crops_coords_top_left_h/w thread into the SDXL micro-conditioning
    time_ids (reference compute_time_ids builds original_size +
    crops_coords_top_left + target_size, diffusers_training_xl_new.py:
    150-158,449-459) and the run still trains and saves."""
    from tweediemix_tpu.cli.train import main as train_main

    inst, _ = image_dirs
    out = tmp_path / "ckpt"
    rc = train_main([
        "--model_preset", "tiny",
        "--resolution", "64",
        "--instance_data_dir", inst,
        "--instance_prompt", "photo of a <v1> cat",
        "--modifier_token", "<v1>",
        "--max_train_steps", "1",
        "--save_steps", "1",
        "--crops_coords_top_left_h", "16",
        "--crops_coords_top_left_w", "8",
        "--output_dir", str(out),
    ])
    assert rc == 0
    assert list(out.glob("delta-*.bin"))


def test_prefetch_batches_worker_exits_when_abandoned():
    """Abandoning the consumer (break/exception in the train loop) must
    release the worker thread instead of leaving it blocked on a full
    queue holding decoded batches alive."""
    import threading
    import time as _time

    from tweediemix_tpu.training.data import prefetch_batches

    before = {t.ident for t in threading.enumerate()}
    gen = prefetch_batches(iter(range(100)), depth=1)
    assert next(gen) == 0
    gen.close()  # abandon mid-iteration
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        workers = [t for t in threading.enumerate()
                   if t.ident not in before and t.is_alive()]
        if not workers:
            break
        _time.sleep(0.1)
    assert not workers, "prefetch worker still alive after consumer close"
