"""CLIP text stack, tokenizer, converter, and CLI pipeline tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tweediemix_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    DualTextEncoder,
    resize_token_embeddings,
    set_token_embedding_rows,
)
from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer, HashTokenizer


def test_clip_text_model_shapes_and_pooling():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((2, 16), jnp.int32).at[0, 3].set(cfg.eos_token_id).at[1, 7].set(cfg.eos_token_id)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]
    pen, final, pooled, pen_ln = jax.jit(lambda p, i: model.apply({"params": p}, i))(params, ids)
    assert pen.shape == (2, 16, cfg.hidden_size)
    assert final.shape == (2, 16, cfg.hidden_size)
    assert pooled.shape == (2, cfg.hidden_size)
    # pooling reads the EOS position: rows with different EOS pos must differ
    assert float(jnp.max(jnp.abs(pooled[0] - pooled[1]))) > 1e-6


def test_clip_projection_dim():
    cfg = CLIPTextConfig.tiny(projection_dim=24)
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32).at[0, 5].set(cfg.eos_token_id)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]
    pooled = model.apply({"params": params}, ids)[2]
    assert pooled.shape == (1, 24)


def test_causal_mask():
    """Earlier tokens must not see later ones: changing a later token cannot
    change earlier hidden states."""
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.arange(8, dtype=jnp.int32)[None] % 50
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]
    f = jax.jit(lambda p, i: model.apply({"params": p}, i)[1])
    a = f(params, ids)
    b = f(params, ids.at[0, 6].set(49))
    np.testing.assert_allclose(np.asarray(a[0, :6]), np.asarray(b[0, :6]), rtol=1e-5, atol=1e-6)
    assert float(jnp.max(jnp.abs(a[0, 6:] - b[0, 6:]))) > 1e-6


def test_modifier_token_surgery():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]
    new_size = cfg.vocab_size + 2
    vec = np.full((cfg.hidden_size,), 0.123, np.float32)
    p2 = set_token_embedding_rows(
        resize_token_embeddings(params, new_size), {cfg.vocab_size: vec}
    )
    emb = traverse_util.flatten_dict(p2)[("token_embedding", "embedding")]
    assert emb.shape[0] == new_size
    np.testing.assert_allclose(np.asarray(emb[cfg.vocab_size]), vec)
    # a model rebuilt with the grown vocab must accept ids at the new rows
    import dataclasses as dc

    grown = CLIPTextModel(dc.replace(cfg, vocab_size=new_size))
    out = grown.apply({"params": p2}, jnp.full((1, 8), cfg.vocab_size, jnp.int32))
    assert bool(jnp.all(jnp.isfinite(out[1])))


def test_dual_encoder_layout():
    c1 = CLIPTextConfig.tiny()
    c2 = CLIPTextConfig.tiny(hidden_size=48, num_heads=4, projection_dim=16)
    text = DualTextEncoder.random_init(c1, c2, jax.random.PRNGKey(0), seq_len=16)
    ids = jnp.zeros((3, 16), jnp.int32).at[:, 5].set(999)
    ctx, pooled = text.encode_ids(ids, ids)
    assert ctx.shape == (3, 16, c1.hidden_size + c2.hidden_size)
    assert pooled.shape == (3, 16)


# ---------------------------------------------------------------------------
# tokenizer


def make_toy_bpe():
    """Tiny CLIP-style vocab: bytes + a few merges."""
    from tweediemix_tpu.utils.tokenizer import bytes_to_unicode

    chars = list(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    n = len(vocab)
    for i, c in enumerate(chars):
        vocab[c + "</w>"] = n + i
    merges = ["c a", "ca t</w>", "d o", "do g</w>"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return vocab, merges


def test_bpe_tokenizer_basic():
    vocab, merges = make_toy_bpe()
    tok = CLIPBPETokenizer(vocab, merges)
    ids = tok.encode("cat dog")
    assert len(ids) == 77
    assert ids[0] == tok.bos_token_id
    assert vocab["cat</w>"] in ids and vocab["dog</w>"] in ids
    eos_pos = ids.index(tok.eos_token_id)
    assert eos_pos == 3  # bos, cat, dog, eos
    # padding with eos by default (SDXL tokenizer 1)
    assert all(i == tok.pad_token_id for i in ids[eos_pos + 1 :])


def test_bpe_added_tokens():
    vocab, merges = make_toy_bpe()
    tok = CLIPBPETokenizer(vocab, merges)
    n0 = len(tok)
    assert tok.add_tokens("<cat1>") == 1
    assert len(tok) == n0 + 1
    tid = tok.convert_tokens_to_ids("<cat1>")
    ids = tok.encode("<cat1> cat")
    assert ids[1] == tid and ids[2] == vocab["cat</w>"]
    # idempotent add
    assert tok.add_tokens("<cat1>") == 0


def test_hash_tokenizer_contract():
    tok = HashTokenizer(1000)
    tok.add_tokens(["<cat1>", "<dog1>"])
    ids = tok.encode("photo of a <cat1> cat")
    assert len(ids) == 77 and ids[0] == tok.bos_token_id
    assert tok.convert_tokens_to_ids("<cat1>") == 1000
    assert tok.convert_tokens_to_ids("<dog1>") == 1001
    assert 1000 in ids


# ---------------------------------------------------------------------------
# converter


def test_convert_unet_roundtrip_micro():
    """Synthesize a diffusers-style torch state dict for the micro UNet and
    check the converted tree matches the flax init tree exactly."""
    from tweediemix_tpu.models.convert import convert_unet_state_dict
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.micro()
    model = UNet2DConditionModel(cfg)
    sample = jax.ShapeDtypeStruct((1, 8, 8, 4), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 16, cfg.cross_attention_dim), jnp.float32)
    pooled = jax.ShapeDtypeStruct((1, cfg.pooled_projection_dim), jnp.float32)
    tids = jax.ShapeDtypeStruct((1, 6), jnp.float32)
    want = traverse_util.flatten_dict(
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0), sample,
            jax.ShapeDtypeStruct((), jnp.int32), ctx, pooled, tids,
        )["params"]
    )

    # independent inverse mapping: flax path → torch name + torch-layout array
    def to_torch(path, shape):
        parts = []
        for seg in path[:-1]:
            seg = seg.replace("down_blocks_", "down_blocks.").replace("up_blocks_", "up_blocks.")
            seg = seg.replace("mid_block_", "mid_block.")
            seg = seg.replace("_resnets_", ".resnets.").replace("_attentions_", ".attentions.")
            seg = seg.replace("_downsamplers_", ".downsamplers.").replace("_upsamplers_", ".upsamplers.")
            seg = seg.replace("resnets_", "resnets.").replace("attentions_", "attentions.")
            seg = seg.replace("transformer_blocks_", "transformer_blocks.")
            seg = seg.replace("net_0_proj", "net.0.proj").replace("net_2", "net.2")
            seg = seg.replace("to_out_0", "to_out.0")
            parts.append(seg)
        leaf = path[-1]
        rank = len(shape)
        if leaf == "kernel":
            name = ".".join(parts) + ".weight"
            if rank == 2:
                arr = np.random.RandomState(hash(path) % 2**31).randn(shape[1], shape[0])
            else:  # conv [kh,kw,I,O] → [O,I,kh,kw]
                arr = np.random.RandomState(hash(path) % 2**31).randn(
                    shape[3], shape[2], shape[0], shape[1]
                )
        elif leaf == "scale":
            name = ".".join(parts) + ".weight"
            arr = np.random.RandomState(hash(path) % 2**31).randn(*shape)
        else:
            name = ".".join(parts) + f".{leaf}"
            arr = np.random.RandomState(hash(path) % 2**31).randn(*shape)
        # ff naming quirk: diffusers uses ff.net.0.proj / ff.net.2
        name = name.replace("ff.net_0_proj", "ff.net.0.proj").replace("ff.net_2", "ff.net.2")
        return name, arr.astype(np.float32)

    sd = {}
    for path, leafshape in want.items():
        name, arr = to_torch(path, leafshape.shape)
        sd[name] = arr

    got = traverse_util.flatten_dict(convert_unet_state_dict(sd))
    assert set(got) == set(want)
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), p


def test_convert_clip_state_dict():
    from tweediemix_tpu.models.convert import convert_clip_state_dict

    cfg = CLIPTextConfig.tiny(projection_dim=24)
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    want = traverse_util.flatten_dict(
        jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)["params"]
    )

    rng = np.random.RandomState(0)
    sd = {
        "text_model.embeddings.token_embedding.weight": rng.randn(cfg.vocab_size, cfg.hidden_size),
        "text_model.embeddings.position_embedding.weight": rng.randn(cfg.max_positions, cfg.hidden_size),
        "text_model.final_layer_norm.weight": rng.randn(cfg.hidden_size),
        "text_model.final_layer_norm.bias": rng.randn(cfg.hidden_size),
        "text_projection.weight": rng.randn(24, cfg.hidden_size),
    }
    for i in range(cfg.num_layers):
        base = f"text_model.encoder.layers.{i}."
        for mod, shp in [
            ("self_attn.q_proj", (cfg.hidden_size, cfg.hidden_size)),
            ("self_attn.k_proj", (cfg.hidden_size, cfg.hidden_size)),
            ("self_attn.v_proj", (cfg.hidden_size, cfg.hidden_size)),
            ("self_attn.out_proj", (cfg.hidden_size, cfg.hidden_size)),
            ("mlp.fc1", (cfg.intermediate_size, cfg.hidden_size)),
            ("mlp.fc2", (cfg.hidden_size, cfg.intermediate_size)),
        ]:
            sd[base + mod + ".weight"] = rng.randn(*shp)
            sd[base + mod + ".bias"] = rng.randn(shp[0])
        for ln in ("layer_norm1", "layer_norm2"):
            sd[base + ln + ".weight"] = rng.randn(cfg.hidden_size)
            sd[base + ln + ".bias"] = rng.randn(cfg.hidden_size)

    got = traverse_util.flatten_dict(convert_clip_state_dict(sd))
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), p


# ---------------------------------------------------------------------------
# CLI end-to-end (tiny preset, precomputed masks)


def test_cli_tiny_end_to_end(tmp_path):
    from PIL import Image

    from tweediemix_tpu.cli.fusion_sampling import main

    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    h = w = 64
    m = np.zeros((h, w), np.uint8)
    m[:, : w // 2] = 255
    Image.fromarray(m).save(mask_dir / "a cat.jpg")
    Image.fromarray(255 - m).save(mask_dir / "a dog.jpg")

    out = tmp_path / "out"
    rc = main([
        "--model_preset", "tiny",
        "--prompt", "photo of a cat running+photo of a dog running+mountain background",
        "--prompt_orig", "photo of a cat and a dog running",
        "--concepts", "cat+dog+mountain",
        "--modifier_token", "<cat1>+<dog1>+<mountain1>",
        "--seg_concepts", "a cat+a dog",
        "--mask_dir", str(mask_dir),
        "--output_path", str(out),
        "--n_timesteps", "6",
        "--t_cond", "0.34",
        "--resampling_steps", "1",
        "--jumping_steps", "1",
        "--guidance_scale", "0.8",
        "--resolution_h", str(h * 8),
        "--resolution_w", str(w * 8),
        "--seed", "3821",
    ])
    assert rc == 0
    files = list(out.glob("*.png"))
    assert len(files) == 1
    img = np.asarray(Image.open(files[0]))
    assert img.ndim == 3 and img.shape[2] == 3


def test_convert_clip_vision_state_dict():
    from tweediemix_tpu.models.clip import CLIPVisionConfig, CLIPVisionModel
    from tweediemix_tpu.models.convert import convert_clip_vision_state_dict

    cfg = CLIPVisionConfig.tiny(projection_dim=24)
    model = CLIPVisionModel(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    want = traverse_util.flatten_dict(
        jax.eval_shape(model.init, jax.random.PRNGKey(0), img)["params"]
    )
    rng = np.random.RandomState(0)
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    d = cfg.hidden_size
    sd = {
        "vision_model.embeddings.patch_embedding.weight": rng.randn(d, 3, cfg.patch_size, cfg.patch_size),
        "vision_model.embeddings.class_embedding": rng.randn(d),
        "vision_model.embeddings.position_embedding.weight": rng.randn(n_pos, d),
        "vision_model.pre_layrnorm.weight": rng.randn(d),
        "vision_model.pre_layrnorm.bias": rng.randn(d),
        "vision_model.post_layernorm.weight": rng.randn(d),
        "vision_model.post_layernorm.bias": rng.randn(d),
        "visual_projection.weight": rng.randn(24, d),
    }
    for i in range(cfg.num_layers):
        base = f"vision_model.encoder.layers.{i}."
        for mod, shp in [
            ("self_attn.q_proj", (d, d)), ("self_attn.k_proj", (d, d)),
            ("self_attn.v_proj", (d, d)), ("self_attn.out_proj", (d, d)),
            ("mlp.fc1", (cfg.intermediate_size, d)), ("mlp.fc2", (d, cfg.intermediate_size)),
        ]:
            sd[base + mod + ".weight"] = rng.randn(*shp)
            sd[base + mod + ".bias"] = rng.randn(shp[0])
        for ln in ("layer_norm1", "layer_norm2"):
            sd[base + ln + ".weight"] = rng.randn(d)
            sd[base + ln + ".bias"] = rng.randn(d)

    got = traverse_util.flatten_dict(convert_clip_vision_state_dict(sd))
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for p in want:
        assert tuple(got[p].shape) == tuple(want[p].shape), p
    pooled = model.apply({"params": traverse_util.unflatten_dict(got)}, img)
    assert pooled.shape == (1, 24)


def test_nearest_tokens_find_disc():
    """find_disc parity probe: a modifier embedding initialized from a known
    vocab row must resolve back to that row (and to itself after a small
    perturbation)."""
    from tweediemix_tpu.models.clip import nearest_tokens

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (50, 8))
    ids, scores = nearest_tokens(table[17], table, top_k=3)
    assert int(ids[0]) == 17
    assert float(scores[0]) >= float(scores[1]) >= float(scores[2])
    noisy = table[17] + 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (8,))
    ids2, _ = nearest_tokens(noisy, table, top_k=1)
    assert int(ids2[0]) == 17
