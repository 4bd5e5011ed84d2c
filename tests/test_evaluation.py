"""CLIP-score evaluation: preprocessing, metric mechanics, CLI contract.

The reference has no eval code; these lock the paper's CLIP-T/CLIP-I
protocol implementation (evaluation.py) at tiny scale."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.evaluation import (
    CLIPScorer,
    clip_preprocess,
    load_image_paths,
    strip_modifier_tokens,
)


@pytest.fixture(scope="module")
def scorer():
    return CLIPScorer.tiny()


def test_strip_modifier_tokens():
    assert (
        strip_modifier_tokens("photo of a <new1> cat and a <new2> dog",
                              ["<new1>", "<new2>"])
        == "photo of a cat and a dog"
    )
    assert strip_modifier_tokens("a cat", []) == "a cat"


def test_clip_preprocess_center_crops_and_normalizes():
    # wide image whose center band is white: shortest-side resize to 8 then
    # center crop 8x8 must land entirely in the white band
    # band extends 8 source px past the crop on each side so the resize's
    # anti-aliasing kernel can't bleed black into the cropped window
    img = np.zeros((16, 64, 3), np.float32)
    img[:, 16:48] = 1.0
    out = clip_preprocess(jnp.asarray(img), 8)
    assert out.shape == (8, 8, 3)
    from tweediemix_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    want = (1.0 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(want, (8, 8, 3)),
                               atol=1e-4)


def test_embeddings_are_unit_norm(scorer):
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (40, 56, 3), np.uint8) for _ in range(3)]
    ie = scorer.embed_images(imgs)
    te = scorer.embed_texts(["a cat", "a dog"])
    np.testing.assert_allclose(np.linalg.norm(ie, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(te, axis=-1), 1.0, atol=1e-5)


def test_clip_i_identical_images_is_one(scorer):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    assert scorer.clip_i([img], [img]) == pytest.approx(1.0, abs=1e-5)


def test_clip_t_deterministic_and_bounded(scorer):
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (32, 48, 3), np.uint8) for _ in range(2)]
    a = scorer.clip_t(imgs, ["a photo of a cat"])
    b = scorer.clip_t(imgs, ["a photo of a cat"])
    assert a == b
    assert -1.0 <= a <= 1.0
    # modifier stripping changes the text actually scored
    c = scorer.clip_t(imgs, ["a photo of a <new1> cat"], ["<new1>"])
    assert c == pytest.approx(a, abs=1e-6)


def test_clip_t_prompt_count_mismatch_raises(scorer):
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (32, 32, 3), np.uint8) for _ in range(3)]
    with pytest.raises(ValueError):
        scorer.clip_t(imgs, ["a", "b"])


def test_load_image_paths_dir_and_glob(tmp_path):
    from PIL import Image

    for name in ("b.png", "a.jpg", "notes.txt"):
        p = tmp_path / name
        if name.endswith(".txt"):
            p.write_text("x")
        else:
            Image.new("RGB", (8, 8)).save(p)
    got = load_image_paths(str(tmp_path))
    assert [os.path.basename(p) for p in got] == ["a.jpg", "b.png"]
    got = load_image_paths(str(tmp_path / "*.png"))
    assert [os.path.basename(p) for p in got] == ["b.png"]
    with pytest.raises(FileNotFoundError):
        load_image_paths(str(tmp_path / "*.webp"))


def test_evaluate_cli_end_to_end(tmp_path):
    from PIL import Image

    from tweediemix_tpu.cli.evaluate import main

    gen = tmp_path / "gen"
    cat = tmp_path / "cat"
    dog = tmp_path / "dog"
    rng = np.random.RandomState(4)
    for d, n in ((gen, 2), (cat, 2), (dog, 1)):
        d.mkdir()
        for i in range(n):
            Image.fromarray(
                rng.randint(0, 255, (24, 24, 3), np.uint8)).save(d / f"{i}.png")
    out = tmp_path / "result.json"
    rc = main([
        "--images", str(gen),
        "--prompt", "photo of a <new1> cat and a <new2> dog",
        "--modifier_token", "<new1>+<new2>",
        "--concept_images", f"{cat}+{dog}",
        "--concepts", "cat+dog",
        "--model_preset", "tiny",
        "--output", str(out),
    ])
    assert rc == 0
    result = json.loads(out.read_text())
    assert result["num_images"] == 2
    assert -1.0 <= result["clip_t"] <= 1.0
    assert set(result["clip_i"]) == {"cat", "dog"}
    for v in result["clip_i"].values():
        assert -1.0 <= v <= 1.0


def test_from_pretrained_combined_checkpoint(tmp_path):
    """A synthetic HF CLIPModel dir (both towers in one state dict +
    tokenizer files) loads, validates, and scores."""
    import torch

    from tweediemix_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
    )
    from tweediemix_tpu.models.convert import clip_params_to_hf_state_dict

    proj = 32
    tcfg = CLIPTextConfig.tiny(projection_dim=proj, vocab_size=512,
                               eos_token_id=511)
    vcfg = CLIPVisionConfig.tiny(projection_dim=proj)
    key = jax.random.PRNGKey(0)
    tparams = CLIPTextModel(tcfg).init(key, jnp.zeros((1, 8), jnp.int32))["params"]
    vparams = CLIPVisionModel(vcfg).init(
        jax.random.fold_in(key, 1),
        jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))["params"]

    # text side: reuse the tested inverse converter, add the CLIPModel prefix
    sd = {}
    for k, v in clip_params_to_hf_state_dict(tparams).items():
        sd[k] = torch.from_numpy(np.asarray(v))

    # vision side: hand-build the HF naming (the exact inverse of
    # convert_clip_vision_state_dict)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(vparams)
    for path, arr in flat.items():
        arr = np.asarray(arr, np.float32)
        if path == ("patch_embedding", "kernel"):
            sd["vision_model.embeddings.patch_embedding.weight"] = (
                torch.from_numpy(arr.transpose(3, 2, 0, 1)))
        elif path == ("class_embedding",):
            sd["vision_model.embeddings.class_embedding"] = torch.from_numpy(arr)
        elif path == ("position_embedding",):
            sd["vision_model.embeddings.position_embedding.weight"] = (
                torch.from_numpy(arr))
        elif path[0] in ("pre_layrnorm", "post_layernorm"):
            leaf = "weight" if path[1] == "scale" else "bias"
            sd[f"vision_model.{path[0]}.{leaf}"] = torch.from_numpy(arr)
        elif path == ("visual_projection", "kernel"):
            sd["visual_projection.weight"] = torch.from_numpy(arr.T)
        else:  # layers_i / mod / leaf
            layer = path[0].split("_")[1]
            mod = path[1]
            hf_mod = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
                      "v_proj": "self_attn.v_proj", "out_proj": "self_attn.out_proj",
                      "fc1": "mlp.fc1", "fc2": "mlp.fc2",
                      "layer_norm1": "layer_norm1", "layer_norm2": "layer_norm2"}[mod]
            if path[2] == "kernel":
                sd[f"vision_model.encoder.layers.{layer}.{hf_mod}.weight"] = (
                    torch.from_numpy(arr.T))
            elif path[2] == "scale":
                sd[f"vision_model.encoder.layers.{layer}.{hf_mod}.weight"] = (
                    torch.from_numpy(arr))
            else:
                sd[f"vision_model.encoder.layers.{layer}.{hf_mod}.bias"] = (
                    torch.from_numpy(arr))

    torch.save(sd, tmp_path / "pytorch_model.bin")
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "projection_dim": proj,
            "text_config": {
                "vocab_size": tcfg.vocab_size, "hidden_size": tcfg.hidden_size,
                "intermediate_size": tcfg.intermediate_size,
                "num_hidden_layers": tcfg.num_layers,
                "num_attention_heads": tcfg.num_heads,
                "max_position_embeddings": tcfg.max_positions,
                "hidden_act": tcfg.hidden_act,
                "eos_token_id": 2,  # the historical bogus value
            },
            "vision_config": {
                "image_size": vcfg.image_size, "patch_size": vcfg.patch_size,
                "hidden_size": vcfg.hidden_size,
                "intermediate_size": vcfg.intermediate_size,
                "num_hidden_layers": vcfg.num_layers,
                "num_attention_heads": vcfg.num_heads,
                "hidden_act": vcfg.hidden_act,
            },
        }, f)
    # minimal real tokenizer files: byte-level vocab + eos/bos specials
    from tweediemix_tpu.utils.tokenizer import bytes_to_unicode

    toks = [v + "</w>" for v in bytes_to_unicode().values()]
    toks += list(bytes_to_unicode().values())
    vocab = {t: i for i, t in enumerate(toks)}
    vocab["<|startoftext|>"] = 510
    vocab["<|endoftext|>"] = 511
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")

    scorer = CLIPScorer.from_pretrained(str(tmp_path))
    # eos pooling must come from the tokenizer, not config.json's bogus 2
    assert scorer.text_cfg.eos_token_id == 511
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    s = scorer.clip_t([img], ["a cat"])
    assert -1.0 <= s <= 1.0
    # and the loaded params match the originals numerically
    got = scorer.embed_texts(["a cat"])
    ids = jnp.asarray(scorer.tokenizer(["a cat"]), jnp.int32)
    want = CLIPTextModel(scorer.text_cfg).apply({"params": tparams}, ids)[2]
    want = want / jnp.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
