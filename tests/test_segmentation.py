"""Segmentation stage tests: SAM shapes/jit, detector contract, LangSAM
predict, heuristic fallback, and the in-loop seg path through the CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.segmentation.detector import DetectorConfig, TextBoxDetector
from tweediemix_tpu.segmentation.lang_sam import HeuristicSegmenter, LangSAM
from tweediemix_tpu.segmentation.sam import SAM, SAMConfig, window_partition, window_unpartition


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = window_unpartition(window_partition(x, 4), 4, (8, 8))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = SAMConfig.tiny()
    model = SAM(cfg)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, cfg.image_size, cfg.image_size, 3))
    boxes = jnp.array([[0.1, 0.1, 0.6, 0.7], [0.3, 0.2, 0.9, 0.8]])
    params = jax.jit(model.init)(key, img, boxes)["params"]
    return cfg, model, params, img, boxes


def test_sam_shapes(tiny_sam):
    cfg, model, params, img, boxes = tiny_sam
    masks, iou = jax.jit(lambda p, i, b: model.apply({"params": p}, i, b))(params, img, boxes)
    g = cfg.grid
    assert masks.shape == (2, 4 * g, 4 * g)
    assert iou.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(masks)))


def test_sam_box_sensitivity(tiny_sam):
    cfg, model, params, img, boxes = tiny_sam
    f = jax.jit(lambda p, i, b: model.apply({"params": p}, i, b)[0])
    a = f(params, img, boxes)
    b = f(params, img, boxes + 0.2)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-5  # prompts matter


def test_detector_contract():
    cfg = DetectorConfig.tiny()
    det = TextBoxDetector(cfg)
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (1, cfg.vision.image_size, cfg.vision.image_size, 3))
    ids = jnp.zeros((1, 16), jnp.int32).at[0, 3].set(999)
    params = jax.jit(det.init)(key, img, ids)["params"]
    boxes, scores = jax.jit(lambda p, i, t: det.apply({"params": p}, i, t))(params, img, ids)
    assert boxes.shape == (cfg.max_boxes, 4)
    assert scores.shape == (cfg.max_boxes,)
    # xyxy in [0,1] and well-ordered
    assert float(boxes.min()) >= 0.0 and float(boxes.max()) <= 1.0
    assert bool(jnp.all(boxes[:, 2] >= boxes[:, 0]))
    assert bool(jnp.all(boxes[:, 3] >= boxes[:, 1]))
    # scores sorted descending (top_k)
    assert bool(jnp.all(jnp.diff(scores) <= 1e-6))
    # text-conditioned: different phrase → different scores
    _, scores2 = det.apply({"params": params}, img, ids.at[0, 3].set(123))
    assert float(jnp.max(jnp.abs(scores - scores2))) > 1e-7


def test_lang_sam_predict():
    ls = LangSAM.random_init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(2), (96, 80, 3))
    masks, boxes, scores, valid = ls.predict(img, "a cat")
    assert masks.shape[1:] == (96, 80)
    assert masks.dtype == jnp.bool_
    assert boxes.shape[0] == masks.shape[0] == scores.shape[0]


def test_no_detection_warns_and_records():
    """When no box clears box_threshold, the segment_fn must warn loudly
    (naming the concept), record the miss, and fall back to the top box
    instead of crashing (the reference IndexErrors, lang_sam.py:95-106)."""
    import warnings

    from tweediemix_tpu.segmentation.lang_sam import make_model_segment_fn

    # box_threshold=2.0: sigmoid scores can never clear it → every concept
    # is a guaranteed no-detection
    ls = LangSAM.random_init(jax.random.PRNGKey(0))
    ls.box_threshold = 2.0
    fn = make_model_segment_fn(ls, "a cat+a dog")
    img = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 3))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        masks = fn(img)
    assert masks.shape[0] == 2
    assert bool(jnp.all(jnp.isfinite(masks)))
    msgs = [str(w.message) for w in caught]
    assert any("a cat" in m and "box_threshold" in m for m in msgs)
    assert any("a dog" in m for m in msgs)
    # recorded on the segment_fn for the caller / output metadata
    assert [c for c, _ in fn.no_detections] == ["a cat", "a dog"]
    # a successful call resets the record
    ls.box_threshold = -1.0
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        fn(img)
    assert fn.no_detections == [] and caught2 == []


def test_heuristic_segmenter_partition():
    seg = HeuristicSegmenter(2)
    img = jnp.ones((1, 32, 48, 3))
    m = seg(img)
    assert m.shape == (2, 32, 48)
    np.testing.assert_allclose(np.asarray(m.sum(0)), 1.0)  # exact partition


def test_cli_with_inprocess_segmentation(tmp_path):
    """Full no-mask-dir path: the sampler's boundary callback runs the
    in-process segmenter (heuristic preset)."""
    from tweediemix_tpu.cli.fusion_sampling import main

    out = tmp_path / "out"
    rc = main([
        "--model_preset", "tiny",
        "--prompt", "photo of a cat running+photo of a dog running+mountain background",
        "--prompt_orig", "photo of a cat and a dog running",
        "--concepts", "cat+dog+mountain",
        "--modifier_token", "<cat1>+<dog1>+<mountain1>",
        "--seg_concepts", "a cat+a dog",
        "--seg_preset", "heuristic",
        "--output_path", str(out),
        "--n_timesteps", "6", "--t_cond", "0.34",
        "--resampling_steps", "0", "--jumping_steps", "1",
        "--guidance_scale", "0.8",
        "--resolution_h", "128", "--resolution_w", "128",
    ])
    assert rc == 0
    assert list(out.glob("*.png"))


def test_cli_with_sam_random_segmentation(tmp_path):
    from tweediemix_tpu.cli.fusion_sampling import main

    out = tmp_path / "out"
    rc = main([
        "--model_preset", "tiny",
        "--prompt", "a cat+a dog+bg",
        "--prompt_orig", "a cat and a dog",
        "--concepts", "cat+dog+bg",
        "--modifier_token", "<a>+<b>+<c>",
        "--seg_concepts", "a cat+a dog",
        "--seg_preset", "sam-random",
        "--output_path", str(out),
        "--n_timesteps", "4", "--t_cond", "0.5",
        "--resampling_steps", "0", "--jumping_steps", "0",
        "--resolution_h", "128", "--resolution_w", "128",
    ])
    assert rc == 0
    assert list(out.glob("*.png"))


def test_convert_detector_roundtrip_tiny():
    """Synthesize an HF OwlViTForObjectDetection-style state dict for the
    tiny detector and check the converted tree covers the flax init tree
    exactly (the owlvit-base-patch32 conversion path at tiny scale)."""
    from flax import traverse_util

    from tweediemix_tpu.models.convert import convert_detector_state_dict

    cfg = DetectorConfig.tiny()
    det = TextBoxDetector(cfg)
    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    ids = jnp.zeros((1, cfg.text.max_positions), jnp.int32).at[0, 3].set(999)
    want = traverse_util.flatten_dict(
        jax.eval_shape(det.init, jax.random.PRNGKey(0), img, ids)["params"]
    )

    rng = np.random.RandomState(0)
    head_inv = {
        ("class_head_dense0",): "class_head.dense0",
        ("logit_shift",): "class_head.logit_shift",
        ("logit_scale",): "class_head.logit_scale",
        ("box_head_dense0",): "box_head.dense0",
        ("box_head_dense1",): "box_head.dense1",
        ("box_head_dense2",): "box_head.dense2",
    }

    def hf_name_and_arr(path, shape):
        """Independent inverse map: flax path → HF torch name + layout."""
        mod, leaf = path[:-1], path[-1]
        if leaf == "kernel":
            if len(shape) == 4:
                arr = rng.randn(shape[3], shape[2], shape[0], shape[1]).astype(np.float32)
            else:
                arr = rng.randn(shape[1], shape[0]).astype(np.float32)
            tleaf = "weight"
        else:
            arr = rng.randn(*shape).astype(np.float32)
            tleaf = "weight" if leaf in ("scale", "embedding") else leaf

        if mod[:1] == ("vision_model",):
            sub = mod[1:]
            if sub == ("patch_embedding",):
                return "owlvit.vision_model.embeddings.patch_embedding.weight", arr
            name = ".".join(sub).replace("layers_", "encoder.layers.")
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                name = name.replace(f".{proj}", f".self_attn.{proj}")
            name = name.replace(".fc1", ".mlp.fc1").replace(".fc2", ".mlp.fc2")
            return f"owlvit.vision_model.{name}.{tleaf}", arr
        if mod[:1] == ("text_model",):
            sub = mod[1:]
            if sub == ("text_projection",):
                return "owlvit.text_projection.weight", arr
            if sub == ("token_embedding",):
                return "owlvit.text_model.embeddings.token_embedding.weight", arr
            name = ".".join(sub).replace("layers_", "encoder.layers.")
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                name = name.replace(f".{proj}", f".self_attn.{proj}")
            name = name.replace(".fc1", ".mlp.fc1").replace(".fc2", ".mlp.fc2")
            return f"owlvit.text_model.{name}.{tleaf}", arr
        if mod == ("merged_layer_norm",):
            return f"layer_norm.{tleaf}", arr
        if mod in head_inv:
            return f"{head_inv[mod]}.{tleaf}", arr
        raise AssertionError(path)

    sd = {}
    for path, leafshape in want.items():
        if path == ("vision_model", "class_embedding"):
            sd["owlvit.vision_model.embeddings.class_embedding"] = (
                rng.randn(*leafshape.shape).astype(np.float32))
        elif path == ("vision_model", "position_embedding"):
            sd["owlvit.vision_model.embeddings.position_embedding.weight"] = (
                rng.randn(*leafshape.shape).astype(np.float32))
        elif path == ("text_model", "position_embedding"):
            sd["owlvit.text_model.embeddings.position_embedding.weight"] = (
                rng.randn(*leafshape.shape).astype(np.float32))
        else:
            name, arr = hf_name_and_arr(path, leafshape.shape)
            sd[name] = arr
    # contrastive-path extras that must be ignored cleanly
    sd["owlvit.visual_projection.weight"] = rng.randn(
        cfg.embed_dim, cfg.vision.hidden_size).astype(np.float32)
    sd["owlvit.logit_scale"] = np.array(2.65926, np.float32)

    got = traverse_util.flatten_dict(convert_detector_state_dict(sd))
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), p
    # converted params must actually run and respond to the text query
    params = traverse_util.unflatten_dict(got)
    boxes, scores = det.apply({"params": params}, img, ids)
    assert bool(jnp.all(jnp.isfinite(boxes))) and bool(jnp.all(jnp.isfinite(scores)))
    _, scores2 = det.apply({"params": params}, img, ids.at[0, 3].set(123))
    assert float(jnp.max(jnp.abs(scores - scores2))) > 1e-7


def test_box_bias_centers():
    """The static OWL-ViT box bias puts sigmoid(bias) at the upstream
    normalized (col+1,row+1)/g 'centers' and 1/g sizes."""
    from tweediemix_tpu.segmentation.detector import _box_bias

    g = 4
    bias = _box_bias(g)
    back = 1.0 / (1.0 + np.exp(-bias))
    # first patch (row 0, col 0) → (1/g, 1/g); last → (1, 1)
    np.testing.assert_allclose(back[0, :2], [1 / g, 1 / g], atol=1e-3)
    np.testing.assert_allclose(back[-1, :2], [1.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(back[:, 2:], 1 / g, atol=1e-3)


def test_cli_sam_preset_fails_fast_without_weights(tmp_path):
    """preset 'sam' with no weights must die at startup, not mid-trajectory."""
    import pytest as _pytest

    from tweediemix_tpu.cli.fusion_sampling import main

    with _pytest.raises(FileNotFoundError):
        main([
            "--model_preset", "tiny",
            "--prompt", "a cat+bg",
            "--prompt_orig", "a cat",
            "--concepts", "cat+bg",
            "--modifier_token", "<a>+<b>",
            "--seg_concepts", "a cat",
            "--seg_preset", "sam",
            "--output_path", str(tmp_path / "out"),
            "--n_timesteps", "2", "--t_cond", "0.5",
            "--resolution_h", "128", "--resolution_w", "128",
        ])


def test_cli_rejects_half_supplied_seg_weights(tmp_path):
    """Exactly one of --sam_checkpoint/--detector_dir with seg_preset unset
    must error, not silently fall back to the heuristic segmenter."""
    import pytest as _pytest

    from tweediemix_tpu.cli.fusion_sampling import main

    with _pytest.raises(SystemExit, match="--detector_dir"):
        main([
            "--model_preset", "tiny",
            "--prompt", "a cat+bg",
            "--prompt_orig", "a cat",
            "--concepts", "cat+bg",
            "--modifier_token", "<a>+<b>",
            "--seg_concepts", "a cat",
            "--sam_checkpoint", str(tmp_path / "sam.pth"),
            "--output_path", str(tmp_path / "out"),
            "--n_timesteps", "2", "--t_cond", "0.5",
            "--resolution_h", "128", "--resolution_w", "128",
        ])


def test_draw_image_overlay_and_boxes():
    from tweediemix_tpu.segmentation.viz import draw_image

    img = np.zeros((20, 30, 3), np.float32)
    mask = np.zeros((20, 30), np.float32)
    mask[5:10, 5:10] = 1.0
    out = draw_image(img, mask[None], boxes=np.array([[0.1, 0.2, 0.8, 0.9]]))
    assert out.shape == (20, 30, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out[7, 7].sum() > 0  # mask region colored
    assert out[4, 4].sum() > 0  # box outline at (y=0.2*20, x=0.1*30)=(4,3)
    assert out[0, 0].sum() == 0  # untouched background


def test_app_predict_headless():
    """The gradio demo's predict path runs without gradio (app.py parity)."""
    from tweediemix_tpu.cli.app import make_predict_fn

    predict = make_predict_fn("sam-random")
    img = np.random.RandomState(0).rand(48, 40, 3).astype(np.float32)
    out = predict(img, "a cat", box_threshold=0.0)
    assert out.shape == (48, 40, 3)
    assert float(np.abs(out - img).max()) > 1e-4  # something was drawn


def test_vit_rel_pos_bias():
    """Zero rel-pos tables reproduce the no-bias path; nonzero tables
    change the output (SAM decomposed relative positions)."""
    from flax import traverse_util

    cfg = SAMConfig.tiny()
    enc_cfg_off = SAMConfig.tiny(use_rel_pos=False)
    from tweediemix_tpu.segmentation.sam import SAMImageEncoder

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, cfg.image_size, cfg.image_size, 3))
    enc = SAMImageEncoder(cfg)
    params = jax.jit(enc.init)(key, img)["params"]
    out_zero = enc.apply({"params": params}, img)

    enc_off = SAMImageEncoder(enc_cfg_off)
    flat = {p: l for p, l in traverse_util.flatten_dict(params).items()
            if "rel_pos" not in p[-1]}
    out_off = enc_off.apply({"params": traverse_util.unflatten_dict(flat)}, img)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_off), rtol=1e-5, atol=1e-6)

    # non-constant tables change the result (a constant table is
    # softmax-invariant: it adds the same bias to every key)
    flat_on = dict(traverse_util.flatten_dict(params))
    for j, p in enumerate(sorted(flat_on)):
        if "rel_pos" in p[-1]:
            flat_on[p] = 0.5 * jax.random.normal(
                jax.random.fold_in(key, j), flat_on[p].shape
            )
    from flax import traverse_util as tu
    out_bias = enc.apply({"params": tu.unflatten_dict(flat_on)}, img)
    assert float(jnp.max(jnp.abs(out_bias - out_zero))) > 1e-4


def test_convert_sam_roundtrip_tiny():
    """Synthesize a segment-anything-style state dict for the tiny SAM and
    check the converted tree covers the flax init tree exactly."""
    from flax import traverse_util

    from tweediemix_tpu.models.convert import convert_sam_state_dict

    cfg = SAMConfig.tiny()
    model = SAM(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    boxes = jnp.zeros((2, 4))
    want = traverse_util.flatten_dict(
        jax.eval_shape(model.init, jax.random.PRNGKey(0), img, boxes)["params"]
    )

    rng = np.random.RandomState(0)

    def torch_name_and_arr(path, shape):
        """Independent inverse map: flax path → upstream torch name + layout."""
        mod, leaf = path[:-1], path[-1]
        arr = rng.randn(*shape).astype(np.float32)
        if leaf == "kernel":
            if mod[-1] in ("up1", "up2"):  # ConvTranspose [kh,kw,in,out] → [in,out,kh,kw]
                arr = rng.randn(shape[2], shape[3], shape[0], shape[1]).astype(np.float32)
            elif len(shape) == 4:  # conv [kh,kw,I,O] → [O,I,kh,kw]
                arr = rng.randn(shape[3], shape[2], shape[0], shape[1]).astype(np.float32)
            else:  # linear
                arr = rng.randn(shape[1], shape[0]).astype(np.float32)
            tleaf = "weight"
        elif leaf == "scale":
            tleaf = "weight"
        else:
            tleaf = leaf

        p = ".".join(mod)
        p = p.replace("image_encoder.patch_embed", "image_encoder.patch_embed.proj")
        p = (p.replace("image_encoder.blocks_", "image_encoder.blocks.")
               .replace("mask_decoder.layers_", "mask_decoder.transformer.layers."))
        import re as _re
        p = _re.sub(r"blocks\.(\d+)\.qkv", r"blocks.\1.attn.qkv", p)
        p = _re.sub(r"blocks\.(\d+)\.proj", r"blocks.\1.attn.proj", p)
        p = _re.sub(r"blocks\.(\d+)\.rel_pos_(h|w)", r"blocks.\1.attn.rel_pos_\2", p)
        p = p.replace("mlp_lin1", "mlp.lin1").replace("mlp_lin2", "mlp.lin2")
        p = p.replace("image_encoder.neck_conv1", "image_encoder.neck.0")
        p = p.replace("image_encoder.neck_norm1", "image_encoder.neck.1")
        p = p.replace("image_encoder.neck_conv2", "image_encoder.neck.2")
        p = p.replace("image_encoder.neck_norm2", "image_encoder.neck.3")
        p = p.replace("mask_decoder.final_attn_token_to_image",
                      "mask_decoder.transformer.final_attn_token_to_image")
        p = p.replace("mask_decoder.norm_final_attn", "mask_decoder.transformer.norm_final_attn")
        p = p.replace("mask_decoder.up1", "mask_decoder.output_upscaling.0")
        p = p.replace("mask_decoder.up_norm", "mask_decoder.output_upscaling.1")
        p = p.replace("mask_decoder.up2", "mask_decoder.output_upscaling.3")
        p = _re.sub(r"mask_decoder\.hyper_(\d+)_lin(\d+)",
                    r"mask_decoder.output_hypernetworks_mlps.\1.layers.\2", p)
        p = _re.sub(r"mask_decoder\.iou_lin(\d+)",
                    r"mask_decoder.iou_prediction_head.layers.\1", p)
        return f"{p}.{tleaf}", arr

    sd = {}
    for path, leafshape in want.items():
        if path == ("image_encoder", "pos_embed"):
            sd["image_encoder.pos_embed"] = rng.randn(*leafshape.shape).astype(np.float32)
        elif path[-1] in ("rel_pos_h", "rel_pos_w"):
            name, _ = torch_name_and_arr(path + ("x",), (1,))
            sd[name.rsplit(".", 1)[0]] = rng.randn(*leafshape.shape).astype(np.float32)
        elif path == ("prompt_encoder", "pe_gaussian"):
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
                rng.randn(*leafshape.shape).astype(np.float32))
        elif path == ("prompt_encoder", "corner_embed"):
            sd["prompt_encoder.point_embeddings.2.weight"] = rng.randn(1, leafshape.shape[1]).astype(np.float32)
            sd["prompt_encoder.point_embeddings.3.weight"] = rng.randn(1, leafshape.shape[1]).astype(np.float32)
        elif path == ("prompt_encoder", "no_mask_embed"):
            sd["prompt_encoder.no_mask_embed.weight"] = rng.randn(1, leafshape.shape[0]).astype(np.float32)
        elif path == ("mask_decoder", "iou_token"):
            sd["mask_decoder.iou_token.weight"] = rng.randn(*leafshape.shape).astype(np.float32)
        elif path == ("mask_decoder", "mask_tokens"):
            sd["mask_decoder.mask_tokens.weight"] = rng.randn(*leafshape.shape).astype(np.float32)
        else:
            name, arr = torch_name_and_arr(path, leafshape.shape)
            sd[name] = arr
    # upstream extras that must be ignored cleanly
    sd["prompt_encoder.not_a_point_embed.weight"] = rng.randn(1, cfg.prompt_dim).astype(np.float32)

    got = traverse_util.flatten_dict(convert_sam_state_dict(sd))
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), p
    # converted params must actually run
    masks, iou = model.apply({"params": traverse_util.unflatten_dict(got)}, img, boxes)
    assert bool(jnp.all(jnp.isfinite(masks)))


def test_generate_labelme_json():
    """LabelMe export (lang_sam/utils.py parity): polygon shapes from
    external contours, speck-sized components dropped."""
    from tweediemix_tpu.segmentation.viz import generate_labelme_json

    m = np.zeros((2, 64, 64), np.float32)
    m[0, 10:40, 10:40] = 1.0   # 900 px — kept
    m[1, 5:8, 5:8] = 1.0       # 9 px — dropped (MIN_AREA)
    d = generate_labelme_json(m, ["a cat", "a dog"], (64, 64), "img.jpg")
    assert d["imageHeight"] == 64 and d["imagePath"] == "img.jpg"
    labels = [s["label"] for s in d["shapes"]]
    assert labels == ["a cat"]
    pts = np.array(d["shapes"][0]["points"])
    assert pts.min() >= 9 and pts.max() <= 40
    assert d["shapes"][0]["shape_type"] == "polygon"


def test_window_partition_pads_non_divisible():
    """ViT-H has grid 64 with window 14: partition must zero-pad like
    upstream segment_anything and unpartition must slice back."""
    from tweediemix_tpu.segmentation.sam import window_partition, window_unpartition

    x = jnp.asarray(np.random.RandomState(0).rand(2, 9, 9, 4), jnp.float32)
    wins = window_partition(x, 4)  # pads 9 -> 12, 3x3 windows
    assert wins.shape == (2 * 9, 4, 4, 4)
    back = window_unpartition(wins, 4, (9, 9))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_sam_encoder_non_divisible_window():
    """SAM encode at a grid not divisible by the window runs and is finite."""
    from tweediemix_tpu.segmentation.sam import SAM, SAMConfig

    cfg = SAMConfig.tiny(image_size=72, patch_size=8, window_size=5)  # grid 9
    sam = SAM(cfg)
    img = jnp.zeros((1, 72, 72, 3))
    boxes = jnp.zeros((2, 4)).at[0].set(jnp.array([0.1, 0.1, 0.6, 0.6]))
    params = jax.jit(sam.init)(jax.random.PRNGKey(0), img, boxes)["params"]
    logits, iou = jax.jit(sam.apply)({"params": params}, img, boxes)
    assert bool(jnp.isfinite(logits).all()) and bool(jnp.isfinite(iou).all())


def test_segment_cli_file_contract(tmp_path):
    """cli/segment writes one '<concept>.jpg' per '+'-separated concept —
    the exact files the reference sampler consumes (run_expand.py:84-87)."""
    from PIL import Image

    from tweediemix_tpu.cli.segment import main

    img = tmp_path / "tweedie.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(img)

    for preset in ["heuristic", "sam-random"]:
        out = tmp_path / f"out_{preset}"
        rc = main([
            "--input_path", str(img),
            "--text_condition", "a cat+a dog",
            "--output_path", str(out),
            "--seg_preset", preset,
        ])
        assert rc == 0
        for name in ["a cat", "a dog"]:
            m = np.asarray(Image.open(out / f"{name}.jpg").convert("L"), np.float32)
            assert m.shape == (64, 64)
            assert m.max() <= 255.0
