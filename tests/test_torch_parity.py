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

    params = convert_clip_state_dict(_sd(model))
    ours = CLIPTextModel(CLIPTextConfig.tiny(projection_dim=32))
    pen, final, pooled = ours.apply({"params": params}, jnp.asarray(ids.numpy()))

    np.testing.assert_allclose(
        np.asarray(pen), out.hidden_states[-2].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(final), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pooled), text_embeds.numpy(), rtol=1e-4, atol=1e-5)


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
