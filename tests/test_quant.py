"""Tests for the opt-in int8 W8A8 serving path (ops/quant.py).

The reference has no quantized inference (its precision floor is fp16
autocast, ``fusion_generation/fusion_sampling.py:492``); this mode is
TPU-native extra headroom, so the tests here define its contract:
bounded per-layer error vs the fp32 matmul, an unchanged param tree, and
a close full-UNet forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.ops.quant import (
    QConv,
    QDense,
    quantize_weight_int8,
    quantize_weight_int8_conv,
    w8a8_conv,
    w8a8_matmul,
)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48))
    wq, scale = quantize_weight_int8(w)
    assert wq.dtype == jnp.int8 and scale.dtype == jnp.float32
    deq = wq.astype(np.float32) * scale[None, :]
    # symmetric per-channel int8: max error is half a quantization step
    step = np.asarray(scale)[None, :]
    assert np.max(np.abs(np.asarray(w) - deq)) <= 0.5 * step.max() + 1e-7


def test_w8a8_matmul_close_to_fp32():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 33, 64))
    w = jax.random.normal(jax.random.fold_in(key, 1), (64, 96)) / 8.0
    ref = x @ w
    got = w8a8_matmul(x, *quantize_weight_int8(w))
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


def test_w8a8_matmul_static_scale_close_to_fp32(monkeypatch):
    # the TWEEDIEMIX_QUANT_STATIC_SCALE perf probe: a fixed per-tensor
    # activation scale must stay numerically close when the given abs-max
    # actually covers the activations (values beyond it clip by design)
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (4, 33, 64))
    w = jax.random.normal(jax.random.fold_in(key, 1), (64, 96)) / 8.0
    ref = x @ w
    monkeypatch.setenv("TWEEDIEMIX_QUANT_STATIC_SCALE",
                       str(float(jnp.max(jnp.abs(x)))))
    got = w8a8_matmul(x, *quantize_weight_int8(w))
    monkeypatch.delenv("TWEEDIEMIX_QUANT_STATIC_SCALE")
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.05, rel


def test_unet_per_site_calibrated_static_scales(tmp_path, monkeypatch):
    """The deployable static-scale form (TWEEDIEMIX_QUANT_SCALES): calibrate
    per-site activation abs-max on a warmup pass (tools/calibrate_quant.py
    machinery), then run with fixed per-tensor scales — fidelity must match
    the dynamic per-row path's contract (corr > 0.99 vs fp32)."""
    import json
    import sys

    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.ops.quant import _static_scales_table

    sys.path.insert(0, "tools")
    from calibrate_quant import calibrate

    cfg = UNetConfig.micro()
    qcfg = UNetConfig.micro(quant="int8")
    unet, qunet = UNet2DConditionModel(cfg), UNet2DConditionModel(qcfg)

    key = jax.random.PRNGKey(0)
    h = w = cfg.sample_size
    sample = 0.3 * jax.random.normal(key, (2, h, w, 4))
    ctx = 0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                  (2, 9, cfg.cross_attention_dim))
    pooled = 0.3 * jax.random.normal(jax.random.fold_in(key, 2),
                                     (2, cfg.pooled_projection_dim))
    tids = jnp.zeros((2, 6))
    args = (sample, jnp.int32(5), ctx, pooled, tids)
    params = unet.init(key, *args)["params"]

    monkeypatch.setenv("TWEEDIEMIX_QUANT_CALIBRATE", "1")
    table = calibrate(qunet, params, [args], margin=1.25)
    monkeypatch.delenv("TWEEDIEMIX_QUANT_CALIBRATE")
    assert len(table) > 10  # every transformer matmul site got a scale
    scales_path = tmp_path / "scales.json"
    scales_path.write_text(json.dumps(table))

    ref = unet.apply({"params": params}, *args)
    monkeypatch.setenv("TWEEDIEMIX_QUANT_SCALES", str(scales_path))
    _static_scales_table.cache_clear()
    try:
        got = qunet.apply({"params": params}, *args)
    finally:
        monkeypatch.delenv("TWEEDIEMIX_QUANT_SCALES")
        _static_scales_table.cache_clear()
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.15, rel
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.99, c


def test_w8a8_handles_zero_rows():
    # all-zero activation rows must not divide by zero
    x = jnp.zeros((2, 5, 16))
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    out = w8a8_matmul(x, *quantize_weight_int8(w))
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_qdense_param_tree_matches_dense():
    import flax.linen as nn

    x = jnp.ones((2, 7, 24))
    for use_bias in (True, False):
        qd = QDense(16, use_bias=use_bias, quant="int8")
        d = nn.Dense(16, use_bias=use_bias)
        qp = qd.init(jax.random.PRNGKey(0), x)["params"]
        dp = d.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(qp) == jax.tree_util.tree_structure(dp)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(qp),
            jax.tree_util.tree_leaves_with_path(dp),
        ):
            assert pa == pb and a.shape == b.shape and a.dtype == b.dtype


def test_w8a8_conv_close_to_fp32():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 9, 9, 16))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 16, 24)) / 8.0
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = w8a8_conv(x, *quantize_weight_int8_conv(w))
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    # per-sample activation scales are coarser than the matmul path's
    # per-token scales — allow a few percent on random-normal data
    assert rel < 0.05, rel


def test_qconv_param_tree_matches_conv():
    import flax.linen as nn

    x = jnp.ones((2, 8, 8, 12))
    for strides in ((1, 1), (2, 2)):
        qc = QConv(16, kernel_size=(3, 3), strides=strides, quant="int8_conv")
        c = nn.Conv(16, kernel_size=(3, 3), strides=strides,
                    padding=((1, 1), (1, 1)))
        qp = qc.init(jax.random.PRNGKey(0), x)["params"]
        cp = c.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(qp) == jax.tree_util.tree_structure(cp)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(qp),
            jax.tree_util.tree_leaves_with_path(cp),
        ):
            assert pa == pb and a.shape == b.shape and a.dtype == b.dtype
        # quant=None reproduces nn.Conv's compute exactly (same init seed)
        np.testing.assert_allclose(
            np.asarray(QConv(16, kernel_size=(3, 3), strides=strides).apply(
                {"params": qp}, x)),
            np.asarray(c.apply({"params": cp}, x)),
            rtol=1e-6, atol=1e-6,
        )


@pytest.mark.parametrize("cfg_kind", ["micro", "tiny"])
@pytest.mark.parametrize("mode", ["int8", "int8_conv"])
def test_unet_quant_structure_and_output(cfg_kind, mode):
    """quant="int8" must not change the param tree, and the forward must
    stay close to the bf16-free fp32 baseline (loose tolerance — this is a
    quantized path)."""
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    mk = getattr(UNetConfig, cfg_kind)
    cfg = mk()
    qcfg = mk(quant=mode)
    unet, qunet = UNet2DConditionModel(cfg), UNet2DConditionModel(qcfg)

    key = jax.random.PRNGKey(0)
    h = w = cfg.sample_size
    sample = 0.3 * jax.random.normal(key, (2, h, w, 4))
    ctx = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (2, 9, cfg.cross_attention_dim))
    pooled = 0.3 * jax.random.normal(jax.random.fold_in(key, 2), (2, cfg.pooled_projection_dim))
    tids = jnp.zeros((2, 6))
    args = (sample, jnp.int32(5), ctx, pooled, tids)

    params = unet.init(key, *args)["params"]
    qparams = qunet.init(key, *args)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(qparams)

    ref = unet.apply({"params": params}, *args)
    got = qunet.apply({"params": params}, *args)  # same weights, int8 compute
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.15, rel
    # and the two must be strongly correlated (quantization noise, not junk)
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.99, c


@pytest.mark.parametrize("mode", ["int8", "int8_conv"])
def test_unet3d_quant_structure_and_output(mode):
    """The video UNet's quant contract: identical param tree, close
    forward (same weights, int8 transformer matmuls — and spatial
    resnet/resample convs under int8_conv)."""
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig.tiny()
    qcfg = UNet3DConfig.tiny(quant=mode)
    unet, qunet = UNet3DConditionModel(cfg), UNet3DConditionModel(qcfg)

    key = jax.random.PRNGKey(0)
    f, h, w = 3, 8, 8
    sample = 0.3 * jax.random.normal(key, (2, f, h, w, 4))
    ctx = 0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                  (2, 7, cfg.cross_attention_dim))
    il = 0.3 * jax.random.normal(jax.random.fold_in(key, 2), (2, f, h, w, 4))
    emb = 0.3 * jax.random.normal(jax.random.fold_in(key, 3),
                                  (2, 1, cfg.cross_attention_dim))
    args = (sample, jnp.int32(5), ctx, il, emb, jnp.float32(8.0))

    params = unet.init(key, *args)["params"]
    qparams = qunet.init(key, *args)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(qparams)

    ref = unet.apply({"params": params}, *args)
    got = qunet.apply({"params": params}, *args)
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.15, rel
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.99, c


def test_unet_quant_composes_with_lora():
    """quant="int8" + LoRA slots: same param tree as the unquantized LoRA
    UNet and a close forward (the LoRA deltas stay fp32 on top of the
    int8 base matmuls — fusion_generation/utils_lora.py:65-79 semantics)."""
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

    kw = dict(concept_slots=3, lora_slots=3, lora_rank=2)
    cfg = UNetConfig.micro(**kw)
    qcfg = UNetConfig.micro(quant="int8", **kw)
    unet, qunet = UNet2DConditionModel(cfg), UNet2DConditionModel(qcfg)

    key = jax.random.PRNGKey(0)
    h = w = cfg.sample_size
    sample = 0.3 * jax.random.normal(key, (2, h, w, 4))
    ctx = 0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                  (2, 9, cfg.cross_attention_dim))
    pooled = 0.3 * jax.random.normal(jax.random.fold_in(key, 2),
                                     (2, cfg.pooled_projection_dim))
    tids = jnp.zeros((2, 6))
    idx = jnp.array([0, 2], jnp.int32)
    args = (sample, jnp.int32(5), ctx, pooled, tids, idx)

    params = unet.init(key, *args)["params"]
    qparams = qunet.init(key, *args)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(qparams)
    # make the (zero-init up) LoRA deltas non-trivial so the test actually
    # exercises delta-on-top-of-quantized-base
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: (0.05 * jax.random.normal(jax.random.PRNGKey(7), x.shape)
                      if "lora_up" in "/".join(str(s) for s in p) else x),
        params)

    ref = unet.apply({"params": params}, *args)
    got = qunet.apply({"params": params}, *args)
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.15, rel
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.99, c


def test_video_cli_accepts_quant_flag(tmp_path):
    """--quant int8 runs the tiny end-to-end video path."""
    from PIL import Image

    from tweediemix_tpu.cli.run_video import main

    img = tmp_path / "cond.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img)
    out = tmp_path / "clip.gif"
    rc = main([
        "--image", str(img), "--prompt", "a cat walking",
        "--model_preset", "tiny", "--num_frames", "4",
        "--n_timesteps", "2", "--height", "32", "--width", "32",
        "--output", str(out), "--quant", "int8",
    ])
    assert rc == 0
    assert out.exists()


def test_fusion_cli_accepts_quant_flag(tmp_path):
    """--quant int8 runs the tiny end-to-end sampling path."""
    from tweediemix_tpu.cli.fusion_sampling import main

    out = tmp_path / "out"
    rc = main([
        "--prompt", "a cat+a dog+bg", "--prompt_orig", "a cat and a dog",
        "--concepts", "cat+dog+bg", "--modifier_token", "<c1>+<c2>+<c3>",
        "--model_preset", "tiny", "--n_timesteps", "4",
        "--resampling_steps", "1", "--jumping_steps", "1",
        "--resolution_h", "64", "--resolution_w", "64",
        "--mask_dir", _write_masks(tmp_path, ("cat", "dog")),
        "--seg_concepts", "cat+dog",
        "--output_path", str(out), "--quant", "int8",
    ])
    assert rc == 0
    assert list(out.glob("*.png"))


def _write_masks(tmp_path, names):
    from PIL import Image

    d = tmp_path / "masks"
    d.mkdir(exist_ok=True)
    for i, n in enumerate(names):
        m = np.zeros((64, 64), np.uint8)
        m[:, i * 32 : (i + 1) * 32] = 255
        Image.fromarray(m).save(d / f"{n}.jpg")
    return str(d)
