"""Numerical parity against the genuine torch/transformers implementations.

The strongest offline validation of the checkpoint converters: instantiate
the real HF module at tiny scale with random weights, convert its state
dict with our converters, and compare outputs numerically. Covers the SDXL
text towers, the CLIP vision tower (video conditioning), and the OWL-ViT
detector (segmentation stage). (diffusers is not installed here, so the
UNets/VAE are covered by shape-roundtrip tests + golden trajectory tests
instead.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_text_pair():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModelWithProjection

    torch.manual_seed(0)
    cfg = HFCfg(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=999, bos_token_id=998, pad_token_id=0, projection_dim=32,
    )
    model = CLIPTextModelWithProjection(cfg).eval()
    ids = torch.randint(1, 998, (2, 77))
    ids[0, 9] = 999
    ids[1, 30] = 999
    return model, ids


def test_clip_text_tower_matches_hf(hf_text_pair):
    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.convert import convert_clip_state_dict

    model, ids = hf_text_pair
    with torch.no_grad():
        out = model.text_model(ids, output_hidden_states=True)
        text_embeds = model(ids).text_embeds
        # clip_skip=1 path: final_layer_norm(hidden_states[-2])
        # (video_gen/pipeline_i2vgen_xl.py:505,202-217)
        skip1 = model.text_model.final_layer_norm(out.hidden_states[-2])

    params = convert_clip_state_dict(_sd(model))
    ours = CLIPTextModel(CLIPTextConfig.tiny(projection_dim=32))
    pen, final, pooled, pen_ln = ours.apply(
        {"params": params}, jnp.asarray(ids.numpy()))

    np.testing.assert_allclose(
        np.asarray(pen), out.hidden_states[-2].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(final), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pooled), text_embeds.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pen_ln), skip1.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_text_tower_gelu_matches_hf():
    """hidden_act="gelu" branch (the bigG / I2VGen-XL tower config,
    fusion_sampling.py:119-123, run_video.py:21-22) — the quick_gelu case
    above never exercises models/clip.py's exact-gelu activation."""
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModelWithProjection

    from tweediemix_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from tweediemix_tpu.models.convert import convert_clip_state_dict

    torch.manual_seed(4)
    cfg = HFCfg(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu",
        eos_token_id=999, bos_token_id=998, pad_token_id=0, projection_dim=32,
    )
    model = CLIPTextModelWithProjection(cfg).eval()
    ids = torch.randint(1, 998, (2, 77))
    ids[0, 5] = 999
    ids[1, 70] = 999
    with torch.no_grad():
        out = model.text_model(ids, output_hidden_states=True)
        text_embeds = model(ids).text_embeds
        skip1 = model.text_model.final_layer_norm(out.hidden_states[-2])

    params = convert_clip_state_dict(_sd(model))
    ours = CLIPTextModel(CLIPTextConfig.tiny(projection_dim=32, hidden_act="gelu"))
    pen, final, pooled, pen_ln = ours.apply(
        {"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(
        np.asarray(pen), out.hidden_states[-2].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(final), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pooled), text_embeds.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pen_ln), skip1.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_vision_tower_matches_hf():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

    from tweediemix_tpu.models.clip import CLIPVisionConfig, CLIPVisionModel
    from tweediemix_tpu.models.convert import convert_clip_vision_state_dict

    torch.manual_seed(1)
    cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=32, patch_size=8,
                projection_dim=32, hidden_act="quick_gelu")
    model = CLIPVisionModelWithProjection(cfg).eval()
    px = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = model(px).image_embeds.numpy()

    params = convert_clip_vision_state_dict(_sd(model))
    ours = CLIPVisionModel(CLIPVisionConfig.tiny())
    got = ours.apply({"params": params}, jnp.asarray(px.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_clip_bpe_tokenizer_matches_hf(tmp_path):
    """Our CLIP BPE implementation must produce identical ids to
    transformers' CLIPTokenizer (lowercasing, whitespace cleanup,
    punctuation splitting, merge ranks, bos/eos/pad-with-eos)."""
    import json

    from transformers import CLIPTokenizer
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer

    base = list(bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in base:
        vocab[ch + "</w>"] = len(vocab)
    merges = ["t h", "th e</w>", "c a", "ca t</w>", "d o", "do g</w>",
              "r u", "ru n", "run n", "runn i", "runni n", "runnin g</w>"]
    for m in merges:
        a, b = m.split()
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")

    hf = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ours = CLIPBPETokenizer.from_dir(str(tmp_path))
    texts = [
        "the cat and a dog running!",
        "THE Cat  dog...",
        "photo of a <new1> cat, mountain background",
        "",
        "a" * 300,  # truncation
    ]
    want = hf(texts, padding="max_length", max_length=77, truncation=True)["input_ids"]
    got = ours(texts)
    assert got == want


def _hf_sam_to_original_names(sd):
    """transformers SamModel state dict → original segment-anything names
    (the layout our converter and lang-segment-anything checkpoints use)."""
    import re

    out = {}
    for k, v in sd.items():
        n = k
        n = n.replace("vision_encoder.", "image_encoder.")
        n = n.replace("patch_embed.projection", "patch_embed.proj")
        n = re.sub(r"image_encoder\.layers\.(\d+)\.", r"image_encoder.blocks.\1.", n)
        n = n.replace(".layer_norm1.", ".norm1.").replace(".layer_norm2.", ".norm2.")
        n = (n.replace("neck.conv1", "neck.0").replace("neck.norm1", "neck.1")
               .replace("neck.conv2", "neck.2").replace("neck.norm2", "neck.3"))
        if n == "shared_image_embedding.positional_embedding":
            n = "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
        if n == "prompt_encoder.shared_embedding.positional_embedding":
            continue  # duplicate of the shared embedding
        n = re.sub(r"prompt_encoder\.point_embed\.(\d)\.", r"prompt_encoder.point_embeddings.\1.", n)
        # decoder
        n = re.sub(r"(transformer\.layers\.\d+)\.layer_norm(\d)", r"\1.norm\2", n)
        n = n.replace("transformer.layer_norm_final_attn", "transformer.norm_final_attn")
        n = n.replace("upscale_conv1", "output_upscaling.0")
        n = n.replace("upscale_layer_norm", "output_upscaling.1")
        n = n.replace("upscale_conv2", "output_upscaling.3")
        # 3-layer MLPs: HF proj_in / layers.0 / proj_out → original
        # layers.0 / 1 / 2 (rename the middle FIRST to avoid collisions)
        for head in ("output_hypernetworks_mlps\\.\\d+", "iou_prediction_head"):
            n = re.sub(rf"({head})\.layers\.0\.", r"\1.layers.1.", n)
            n = re.sub(rf"({head})\.proj_in\.", r"\1.layers.0.", n)
            n = re.sub(rf"({head})\.proj_out\.", r"\1.layers.2.", n)
        out[n] = v
    return out


def test_sam_matches_hf():
    """Full SamModel (box prompt, multimask_output=False) vs our Flax SAM:
    converted weights must reproduce HF's low-res mask logits and IoU —
    covering window/global rel-pos attention, the neck, the two-way
    decoder (incl. the no-residual first self-attn), the no_mask dense
    embedding, upscaling, and the hypernetwork/iou heads."""
    from transformers import SamConfig, SamModel

    from tweediemix_tpu.models.convert import convert_sam_state_dict
    from tweediemix_tpu.segmentation.sam import SAM, SAMConfig

    torch.manual_seed(3)
    hf_cfg = SamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, image_size=64, patch_size=8,
                           output_channels=16, global_attn_indexes=[1],
                           window_size=4, mlp_ratio=4.0, num_pos_feats=8),
        prompt_encoder_config=dict(hidden_size=16, image_embedding_size=8,
                                   image_size=64, patch_size=8,
                                   mask_input_channels=4),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 iou_head_hidden_dim=16, mlp_dim=128),
    )
    model = SamModel(hf_cfg).eval()
    px = torch.randn(1, 3, 64, 64)
    boxes01 = np.array([[0.1, 0.2, 0.7, 0.8], [0.3, 0.1, 0.9, 0.6]], np.float32)
    # HF shifts boxes by +0.5px then normalizes by image_size; feed pixel
    # coords that normalize to exactly boxes01
    boxes_px = torch.tensor(boxes01 * 64.0 - 0.5)[None]
    with torch.no_grad():
        out = model(pixel_values=px, input_boxes=boxes_px, multimask_output=False)
    want_masks = out.pred_masks[0, :, 0].numpy()  # [2, 32, 32]
    want_iou = out.iou_scores[0, :, 0].numpy()

    sd = _hf_sam_to_original_names(_sd(model))
    params = convert_sam_state_dict(sd)
    ours = SAM(SAMConfig.tiny())
    masks, iou = ours.apply(
        {"params": params}, jnp.asarray(px.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(boxes01),
    )
    np.testing.assert_allclose(np.asarray(masks), want_masks, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), want_iou, rtol=1e-3, atol=1e-4)


def test_owlvit_detector_matches_hf():
    """Full OwlViTForObjectDetection vs our TextBoxDetector: converted
    weights must reproduce HF's class logits and boxes (incl. the merged
    class-token features and the static box bias)."""
    from transformers import OwlViTConfig, OwlViTForObjectDetection

    from tweediemix_tpu.models.convert import convert_detector_state_dict
    from tweediemix_tpu.segmentation.detector import DetectorConfig, TextBoxDetector

    torch.manual_seed(2)
    cfg = OwlViTConfig(
        text_config=dict(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, eos_token_id=999, bos_token_id=998,
            pad_token_id=0, hidden_act="quick_gelu",
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
        projection_dim=32,
    )
    model = OwlViTForObjectDetection(cfg).eval()
    ids = torch.randint(1, 998, (1, 16))
    ids[0, 7] = 999  # first occurrence of the max id = HF's pooling position
    px = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        out = model(input_ids=ids, pixel_values=px,
                    attention_mask=torch.ones_like(ids))
    hf_scores = torch.sigmoid(out.logits[0, :, 0]).numpy()
    cxcy, wh = out.pred_boxes[0, :, :2].numpy(), out.pred_boxes[0, :, 2:].numpy()
    hf_boxes = np.clip(
        np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1), 0.0, 1.0)

    dcfg = DetectorConfig.tiny(max_boxes=16)  # all patches → direct compare
    det = TextBoxDetector(dcfg)
    params = convert_detector_state_dict(_sd(model))
    boxes, scores = det.apply(
        {"params": params},
        jnp.asarray(px.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ids.numpy()),
    )
    # ours returns top-k sorted; realign by HF score order
    order = np.argsort(-hf_scores, kind="stable")
    np.testing.assert_allclose(np.asarray(scores), hf_scores[order],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes), hf_boxes[order],
                               rtol=1e-4, atol=2e-5)
