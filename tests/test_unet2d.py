"""UNet tests.

Semantic equivalence with the reference's per-row weight swapping
(utils_custom.py:61-82, utils_lora.py:65-79) is tested at the single
attention-module level, where fp32 comparisons are tight. At the whole-UNet
level we test *same-program* properties (row independence, slot selection,
idx-invariance for degenerate stacks): comparing differently-shaped or
differently-fused XLA programs bit-for-bit in fp32 is ill-conditioned on CPU
(verified: batched-vs-sliced differences vanish exactly in f64 but reach
~1e-2 in fp32 through GroupNorm chains, and x64 CPU compiles take minutes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tweediemix_tpu.concepts.delta import stack_cd_params, stack_lora_params
from tweediemix_tpu.models.unet2d import Attention, UNet2DConditionModel, UNetConfig


def jit_apply(model):
    return jax.jit(lambda p, *a: model.apply({"params": p}, *a))


def make_inputs(key, b, cfg, size=8):
    ks = jax.random.split(key, 4)
    sample = jax.random.normal(ks[0], (b, size, size, cfg.in_channels))
    ctx = jax.random.normal(ks[1], (b, 16, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (b, cfg.pooled_projection_dim))
    time_ids = jnp.tile(
        jnp.array([[size * 8, size * 8, 0, 0, size * 8, size * 8]], jnp.float32), (b, 1)
    )
    return sample, ctx, pooled, time_ids


# ---------------------------------------------------------------------------
# attention-module level: exact reference semantics


def test_attention_cd_stack_matches_weight_swap():
    """Fused cross-attn row i == plain cross-attn with concept i's K/V."""
    key = jax.random.PRNGKey(0)
    plain = Attention(query_dim=32, heads=2, dim_head=16, cross_attention_dim=48)
    fused = Attention(query_dim=32, heads=2, dim_head=16, cross_attention_dim=48, concept_slots=3)
    x = jax.random.normal(key, (3, 10, 32))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (3, 7, 48))
    params = jax.jit(plain.init)(key, x, ctx)["params"]
    plain_apply = jax.jit(lambda p, *a: plain.apply({"params": p}, *a))
    fused_apply = jax.jit(lambda p, *a: fused.apply({"params": p}, *a))

    kvs = []
    for i in range(2):
        k2 = jax.random.fold_in(key, 100 + i)
        kvs.append(
            {
                ("to_k", "kernel"): np.asarray(params["to_k"]["kernel"])
                + 0.3 * np.asarray(jax.random.normal(k2, (48, 32))),
                ("to_v", "kernel"): np.asarray(params["to_v"]["kernel"])
                + 0.3 * np.asarray(jax.random.normal(jax.random.fold_in(k2, 1), (48, 32))),
            }
        )
    flat = dict(traverse_util.flatten_dict(params))
    stacks = {"to_k": [flat[("to_k", "kernel")]], "to_v": [flat[("to_v", "kernel")]]}
    for kv in kvs:
        stacks["to_k"].append(kv[("to_k", "kernel")])
        stacks["to_v"].append(kv[("to_v", "kernel")])
    fused_flat = {p: l for p, l in flat.items() if p[0] not in ("to_k", "to_v")}
    fused_flat[("to_k_stack",)] = jnp.asarray(np.stack(stacks["to_k"]))
    fused_flat[("to_v_stack",)] = jnp.asarray(np.stack(stacks["to_v"]))
    fused_params = traverse_util.unflatten_dict(fused_flat)

    got = fused_apply(fused_params, x, ctx, jnp.array([0, 1, 2], jnp.int32))
    for i in range(3):
        row_params = dict(flat)
        if i > 0:
            row_params[("to_k", "kernel")] = jnp.asarray(kvs[i - 1][("to_k", "kernel")])
            row_params[("to_v", "kernel")] = jnp.asarray(kvs[i - 1][("to_v", "kernel")])
        want = plain_apply(
            traverse_util.unflatten_dict(row_params), x[i : i + 1], ctx[i : i + 1]
        )
        np.testing.assert_allclose(
            np.asarray(got[i : i + 1]), np.asarray(want), rtol=1e-4, atol=1e-5, err_msg=f"row {i}"
        )


def test_attention_lora_matches_manual_delta():
    """LoRA-slotted attention row i == plain attention + manual q/k/v/out deltas."""
    key = jax.random.PRNGKey(1)
    plain = Attention(query_dim=32, heads=2, dim_head=16, cross_attention_dim=48)
    lora = Attention(query_dim=32, heads=2, dim_head=16, cross_attention_dim=48, lora_slots=2, lora_rank=4)
    x = jax.random.normal(key, (2, 10, 32))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 48))
    params = jax.jit(plain.init)(key, x, ctx)["params"]

    shapes = {
        "to_q_lora_down": (32, 4), "to_q_lora_up": (4, 32),
        "to_k_lora_down": (48, 4), "to_k_lora_up": (4, 32),
        "to_v_lora_down": (48, 4), "to_v_lora_up": (4, 32),
        "to_out_lora_down": (32, 4), "to_out_lora_up": (4, 32),
    }
    factors = {
        n: 0.2 * np.asarray(jax.random.normal(jax.random.fold_in(key, 7 + j), s))
        for j, (n, s) in enumerate(shapes.items())
    }
    lp = dict(traverse_util.flatten_dict(params))
    for n, s in shapes.items():
        lp[(n,)] = jnp.asarray(np.stack([np.zeros(s, np.float32), factors[n]]))
    lora_params = traverse_util.unflatten_dict(lp)

    got = jax.jit(lambda p, *a: lora.apply({"params": p}, *a))(lora_params, x, ctx, jnp.array([0, 1], jnp.int32))

    # row 0: no delta
    want0 = jax.jit(lambda p, *a: plain.apply({"params": p}, *a))(params, x[:1], ctx[:1])
    np.testing.assert_allclose(np.asarray(got[:1]), np.asarray(want0), rtol=1e-5, atol=1e-6)

    # row 1: manual recomputation with deltas (reference forward,
    # utils_lora.py:65-79,101-121)
    p = params
    q = x[1:] @ p["to_q"]["kernel"] + (x[1:] @ factors["to_q_lora_down"]) @ factors["to_q_lora_up"]
    k = ctx[1:] @ p["to_k"]["kernel"] + (ctx[1:] @ factors["to_k_lora_down"]) @ factors["to_k_lora_up"]
    v = ctx[1:] @ p["to_v"]["kernel"] + (ctx[1:] @ factors["to_v_lora_down"]) @ factors["to_v_lora_up"]

    def mha(q, k, v, h):
        b, s, d = q.shape
        dh = d // h
        qs = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
        ks = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        vs = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", qs, ks) * dh**-0.5, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", a, vs)
        return o.transpose(0, 2, 1, 3).reshape(b, s, d)

    hidden = mha(q, k, v, 2)
    out = hidden @ p["to_out_0"]["kernel"] + p["to_out_0"]["bias"]
    out = out + (hidden @ factors["to_out_lora_down"]) @ factors["to_out_lora_up"]
    np.testing.assert_allclose(np.asarray(got[1:]), np.asarray(out), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# whole-UNet level: same-program properties


@pytest.fixture(scope="module")
def micro_setup():
    cfg = UNetConfig.micro()
    model = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    inputs = make_inputs(jax.random.fold_in(key, 1), 3, cfg)
    params = jax.jit(model.init)(key, inputs[0], jnp.int32(1), *inputs[1:])["params"]
    return cfg, model, params, inputs


def test_unet_forward_finite(micro_setup):
    cfg, model, params, (sample, ctx, pooled, tids) = micro_setup
    out = jit_apply(model)(params, sample, jnp.int32(501), ctx, pooled, tids)
    assert out.shape == sample.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_sdxl_topology_shapes():
    """Full SDXL config traces to the right shapes (eval_shape: no compile)."""
    cfg = UNetConfig.sdxl(dtype=jnp.bfloat16)
    model = UNet2DConditionModel(cfg)
    b = 3
    sample = jax.ShapeDtypeStruct((b, 128, 128, 4), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct((b, 77, 2048), jnp.bfloat16)
    pooled = jax.ShapeDtypeStruct((b, 1280), jnp.bfloat16)
    tids = jax.ShapeDtypeStruct((b, 6), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t, ctx, pooled, tids)
    flat = traverse_util.flatten_dict(shapes["params"])
    # SDXL has 70 cross-attention modules (24 down + 36 up + 10 mid);
    # utils_custom.py:113-158 patches exactly these.
    n_attn2 = len({p[: p.index("attn2") + 1] for p in flat if "attn2" in p})
    assert n_attn2 == 70
    out = jax.eval_shape(
        lambda p, *a: model.apply({"params": p}, *a),
        shapes["params"], sample, t, ctx, pooled, tids,
    )
    assert out.shape == (b, 128, 128, 4)
    # param count sanity: SDXL UNet is ~2.57B params
    total = sum(int(np.prod(s.shape)) for s in flat.values())
    assert 2.4e9 < total < 2.7e9, total


def test_unet_tiny_topology_shapes():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    sample = jax.ShapeDtypeStruct((2, 8, 8, 4), jnp.float32)
    ctx = jax.ShapeDtypeStruct((2, 16, cfg.cross_attention_dim), jnp.float32)
    pooled = jax.ShapeDtypeStruct((2, cfg.pooled_projection_dim), jnp.float32)
    tids = jax.ShapeDtypeStruct((2, 6), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t, ctx, pooled, tids)
    out = jax.eval_shape(
        lambda p, *a: model.apply({"params": p}, *a),
        shapes["params"], sample, t, ctx, pooled, tids,
    )
    assert out.shape == (2, 8, 8, 4)


def test_unet_cd_row_selection(micro_setup):
    """Same program, different concept_idx: batched rows select slots
    independently — got[idx=[0,1,2]][i] == got[idx=[i,i,i]][i]."""
    cfg, model, params, (sample, ctx, pooled, tids) = micro_setup
    key = jax.random.PRNGKey(7)
    flat = traverse_util.flatten_dict(params)
    kvs = []
    for i in range(2):
        kv = {}
        for path, leaf in flat.items():
            if len(path) >= 3 and path[-3] == "attn2" and path[-2] in ("to_k", "to_v"):
                k2 = jax.random.fold_in(key, (i * 31 + hash(path)) % (2**31))
                kv[path] = np.asarray(leaf + 0.3 * jax.random.normal(k2, leaf.shape))
        kvs.append(kv)
    stacked = stack_cd_params(params, kvs)
    fused = UNet2DConditionModel(UNetConfig.micro(concept_slots=3))
    apply = jit_apply(fused)

    mixed = apply(stacked, sample, jnp.int32(301), ctx, pooled, tids, jnp.array([0, 1, 2], jnp.int32))
    outs_uniform = [
        apply(stacked, sample, jnp.int32(301), ctx, pooled, tids, jnp.full((3,), s, jnp.int32))
        for s in range(3)
    ]
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(mixed[i]), np.asarray(outs_uniform[i][i]), rtol=1e-6, atol=1e-6,
            err_msg=f"row {i}",
        )
    # different slots genuinely differ
    assert float(jnp.max(jnp.abs(outs_uniform[1] - outs_uniform[0]))) > 1e-3


def test_unet_lora_slot0_matches_all_zero(micro_setup):
    """Slot 0 (zero factors) must reproduce the all-zero-LoRA output, and
    nonzero slots must not (utils_lora.py:63 time-gate → idx-gate)."""
    cfg, model, params, (sample, ctx, pooled, tids) = micro_setup
    lora_model = UNet2DConditionModel(UNetConfig.micro(lora_slots=3))
    key = jax.random.PRNGKey(11)
    shapes = traverse_util.flatten_dict(
        jax.eval_shape(
            lora_model.init, jax.random.PRNGKey(0), sample, jnp.int32(1), ctx, pooled, tids
        )["params"]
    )
    loras, zero_loras = [], []
    for c in range(2):
        lora, zl = {}, {}
        for path, sh in shapes.items():
            if "_lora_" in path[-1]:
                k2 = jax.random.fold_in(key, (c * 7919 + hash(path)) % (2**31))
                lora[path] = 0.2 * np.asarray(jax.random.normal(k2, sh.shape[1:]))
                zl[path] = np.zeros(sh.shape[1:], np.float32)
        loras.append(lora)
        zero_loras.append(zl)
    stacked = stack_lora_params(params, loras, rank=4)
    stacked_zero = stack_lora_params(params, zero_loras, rank=4)
    apply = jit_apply(lora_model)

    idx0 = jnp.zeros((3,), jnp.int32)
    base = apply(stacked_zero, sample, jnp.int32(301), ctx, pooled, tids, idx0)
    got0 = apply(stacked, sample, jnp.int32(301), ctx, pooled, tids, idx0)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(base), rtol=1e-6, atol=1e-6)

    got12 = apply(stacked, sample, jnp.int32(301), ctx, pooled, tids, jnp.array([0, 1, 2], jnp.int32))
    np.testing.assert_allclose(np.asarray(got12[0]), np.asarray(base[0]), rtol=1e-6, atol=1e-6)
    assert float(jnp.max(jnp.abs(got12[1] - base[1]))) > 1e-4
    assert float(jnp.max(jnp.abs(got12[2] - base[2]))) > 1e-4


def test_stacked_param_tree_matches_init(micro_setup):
    """stack_cd_params must produce exactly the tree a concept_slots model
    expects."""
    cfg, model, params, (sample, ctx, pooled, tids) = micro_setup
    flat = traverse_util.flatten_dict(params)
    kv = {
        p: np.asarray(l)
        for p, l in flat.items()
        if len(p) >= 3 and p[-3] == "attn2" and p[-2] in ("to_k", "to_v")
    }
    stacked = stack_cd_params(params, [kv])
    fused = UNet2DConditionModel(UNetConfig.micro(concept_slots=2))
    want_tree = jax.eval_shape(
        fused.init, jax.random.PRNGKey(0), sample, jnp.int32(1), ctx, pooled, tids
    )["params"]
    flat_want = traverse_util.flatten_dict(want_tree)
    flat_got = traverse_util.flatten_dict(stacked)
    assert set(flat_want) == set(flat_got)
    for p in flat_want:
        assert tuple(flat_want[p].shape) == tuple(jnp.shape(flat_got[p])), p


# ---------------------------------------------------------------------------
# precomputed cross-attention K/V cache


@pytest.mark.parametrize("mode", ["cd", "lora", "plain"])
def test_precompute_cross_kv_matches_inline(mode):
    """UNet forward with a precomputed cross-KV cache == the inline path.

    The cache path must be numerically identical (same ops, same dtypes) —
    it only hoists the loop-invariant K/V work out of the sampling scan.
    """
    from tweediemix_tpu.models.unet2d import precompute_cross_kv

    kw = {"cd": dict(concept_slots=3), "lora": dict(lora_slots=3), "plain": {}}[mode]
    cfg = UNetConfig.micro(**kw)
    model = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(7)
    b = 3
    sample, ctx, pooled, time_ids = make_inputs(key, b, cfg)
    idx = jnp.array([0, 1, 2], jnp.int32) if mode != "plain" else jnp.zeros((b,), jnp.int32)
    params = model.init(key, sample, jnp.int32(5), ctx, pooled, time_ids, idx)["params"]

    inline = jit_apply(model)(params, sample, jnp.int32(5), ctx, pooled, time_ids, idx)
    kv = precompute_cross_kv(cfg, params, ctx, idx)
    cached = jax.jit(
        lambda p, kv: model.apply(
            {"params": p}, sample, jnp.int32(5), ctx, pooled, time_ids, idx,
            cross_kv=kv,
        )
    )(params, kv)
    np.testing.assert_allclose(np.asarray(inline), np.asarray(cached), atol=2e-5, rtol=2e-5)
