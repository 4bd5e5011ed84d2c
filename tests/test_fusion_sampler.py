"""Golden trajectory test: the scan-based FusionSampler must reproduce,
step for step, an independent straight-line re-derivation of the reference
loop (fusion_generation/fusion_sampling.py:309-530 and the LoRA t_stop
window of fusion_sampling_lora.py), both driven by the same mock UNet."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.fusion.masks import build_region_masks
from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler, TextEmbeds
from tweediemix_tpu.schedulers.ddim import DDIMTable

H = W = 16  # latent res for the mock (image res 128)
N = 3  # concepts incl. background
S_CTX, D_CTX, D_POOL = 4, 8, 6


def make_embeds(key):
    """Rows tagged by distinct pooled[:, 0] so the mock UNet can tell them
    apart; ctx filled with small noise."""
    ks = jax.random.split(key, 3)

    def rows(k, n, tag0):
        ctx = 0.1 * jax.random.normal(k, (n, S_CTX, D_CTX))
        pooled = jnp.zeros((n, D_POOL)).at[:, 0].set(tag0 + jnp.arange(n, dtype=jnp.float32))
        return ctx, pooled

    jc, jp = rows(ks[0], 2, 0.0)  # uncond=0, multi=1
    sc, sp = rows(ks[1], N - 1, 10.0)  # singles 10, 11
    cc, cp = rows(ks[2], N + 1, 20.0)  # uncond', c1..cN = 20..23
    return TextEmbeds(jc, jp, sc, sp, cc, cp)


def mock_unet(params, x, t, ctx, pooled, concept_idx):
    """Deterministic, row- and concept-dependent eps (pure jnp; ignores
    params — the real unet_fn threads its pytree through here)."""
    tag = pooled[:, 0][:, None, None, None]
    idx = concept_idx.astype(jnp.float32)[:, None, None, None]
    tf = jnp.asarray(t, jnp.float32) / 1000.0
    return jnp.tanh(0.3 * x) * (1.0 + 0.03 * tag) + 0.01 * tf + 0.02 * idx + 0.001 * jnp.mean(ctx)


def mock_segment(preview_x0):
    """Deterministic fg masks (image res) from the preview latent: split the
    image by whether the (upsampled) preview is above/below its mean."""
    p = preview_x0[0, :, :, 0]
    thr = jnp.mean(p)
    m0 = (p > thr).astype(jnp.float32)
    m1 = (p <= thr).astype(jnp.float32) * 0.7  # not a clean partition
    up = lambda m: jax.image.resize(m, (H * 8, W * 8), method="nearest")
    return jnp.stack([up(m0), up(m1)])


# ---------------------------------------------------------------------------
# independent reference mirror (plain python loop over numpy-ish jnp arrays)


def reference_trajectory(table: DDIMTable, cfg: FusionConfig, embeds: TextEmbeds, x0_init):
    ts = np.asarray(table.timesteps)
    skip = table.skip
    g = cfg.guidance_scale
    S = cfg.n_timesteps

    def alpha(t):
        return table.alpha(jnp.int32(t))

    def tweedie(x, eps, at):
        return (x - jnp.sqrt(1 - at) * eps) / jnp.sqrt(at)

    def renoise(x0, eps, at):
        return jnp.sqrt(at) * x0 + jnp.sqrt(1 - at) * eps

    def unet(x_rows, t, ctx, pooled, idx):
        return mock_unet(None, x_rows, jnp.int32(t), ctx, pooled, idx)

    t_cond_idx = cfg.t_cond_idx
    t_stop_idx = cfg.fused_end_idx
    t_cond_cur, t_cond_prev, start_t = ts[t_cond_idx], ts[t_cond_idx - 1], ts[0]
    zeros = lambda n: jnp.zeros((n,), jnp.int32)
    pro_ctx = jnp.concatenate([embeds.joint_ctx, embeds.single_ctx], 0)
    pro_pooled = jnp.concatenate([embeds.joint_pooled, embeds.single_pooled], 0)

    x = x0_init
    masks = None
    for i, t in enumerate(ts):
        at, at_next = alpha(t), alpha(t - skip)
        fused = (t <= t_cond_cur) and (t >= ts[t_stop_idx])
        if fused:
            xin = jnp.concatenate([x] * (N + 1), 0)
            eps = unet(xin, t, embeds.concept_ctx, embeds.concept_pooled,
                       jnp.arange(N + 1, dtype=jnp.int32))
            eps_u = eps[0:1]
            x0 = jnp.zeros_like(x)
            for cc in range(N):
                e = eps_u + g * (eps[1 + cc : 2 + cc] - eps_u)
                x0 = x0 + masks[cc][None, :, :, None] * tweedie(x, e, at)
        elif t == start_t:
            eps = unet(jnp.concatenate([x] * (N + 1), 0), t, pro_ctx, pro_pooled, zeros(N + 1))
            for _ in range(cfg.resampling_steps):
                eps_u = eps[0:1]
                e_m = eps_u + g * (eps[1:2] - eps_u)
                x0 = (N - 1) * tweedie(x, e_m, at)
                for cc in range(N - 1):
                    e_s = eps_u + g * (eps[2 + cc : 3 + cc] - eps_u)
                    x0 = x0 - tweedie(x, e_s, at)
                xl = renoise(x0, eps_u, at_next)
                eps2 = unet(jnp.concatenate([xl] * 2, 0), t - skip,
                            embeds.joint_ctx, embeds.joint_pooled, zeros(2))
                e_n = eps2[0:1] + g * (eps2[1:2] - eps2[0:1])
                x0n = tweedie(xl, e_n, at_next)
                x = renoise(x0n, eps2[0:1], at)
                eps = unet(jnp.concatenate([x] * (N + 1), 0), t, pro_ctx, pro_pooled, zeros(N + 1))
            eps_u = eps[0:1]
            e = eps_u + g * (eps[1:2] - eps_u)
            x0 = tweedie(x, e, at)
        else:
            eps2 = unet(jnp.concatenate([x] * 2, 0), t,
                        embeds.joint_ctx, embeds.joint_pooled, zeros(2))
            eps_u = eps2[0:1]
            e = eps_u + g * (eps2[1:2] - eps_u)
            x0 = tweedie(x, e, at)

        x_next = renoise(x0, eps_u, at_next)

        if t == t_cond_prev:
            xl, tt, x0j = x_next, int(t) - skip, x0
            for _ in range(cfg.jumping_steps):
                atj = alpha(tt)
                eps2 = unet(jnp.concatenate([xl] * 2, 0), tt,
                            embeds.joint_ctx, embeds.joint_pooled, zeros(2))
                e = eps2[0:1] + g * (eps2[1:2] - eps2[0:1])
                tt -= cfg.jump_stride
                x0j = tweedie(xl, e, atj)
                xl = renoise(x0j, eps2[0:1], alpha(tt))
            fg = mock_segment(x0j)
            masks = build_region_masks(fg, H, W)

        if t == 1:
            x_next = x0
        x = x_next
    return x


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),  # CD defaults (resample 10, jump 5, fuse to end)
        dict(resampling_steps=0, jumping_steps=2),
        dict(t_stop=0.8),  # LoRA window: joint tail after fusion
        dict(t_cond=0.4, resampling_steps=3, jumping_steps=0),
    ],
    ids=["cd-default", "no-resample", "lora-tstop", "tcond0.4-nojump"],
)
def test_sampler_matches_reference_mirror(kwargs):
    base = dict(
        n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8,
        resampling_steps=2, jumping_steps=2,
    )
    base.update(kwargs)
    cfg = FusionConfig(**base)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(0)
    embeds = make_embeds(jax.random.fold_in(key, 1))

    sampler = FusionSampler(
        table, cfg, mock_unet,
        decode_preview_fn=lambda x0: x0,  # mock_segment reads the latent directly
        segment_fn=mock_segment,
    )
    x_init = sampler.init_latent(jax.random.fold_in(key, 2))

    want = reference_trajectory(table, cfg, embeds, x_init)

    # re-run our sampler from the identical init latent
    x = x_init
    x, x0 = jax.jit(sampler.prologue)(None, embeds, x)
    x, x0_last = sampler.joint_scan(None, embeds, x, 1, cfg.t_cond_idx)
    if x0_last is None:
        x0_last = x0
    preview = sampler.jumping(None, embeds, x) if cfg.jumping_steps > 0 else x0_last
    masks = sampler.compute_masks(preview, None)
    x = sampler.fused_scan(None, embeds, x, masks, cfg.t_cond_idx, cfg.fused_end_idx + 1)
    if cfg.fused_end_idx + 1 < cfg.n_timesteps:
        x, _ = sampler.joint_scan(None, embeds, x, cfg.fused_end_idx + 1, cfg.n_timesteps)

    np.testing.assert_allclose(np.asarray(x), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_run_wrapper_matches_manual_pipeline():
    cfg = FusionConfig(n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8,
                       resampling_steps=1, jumping_steps=1)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(3)
    embeds = make_embeds(jax.random.fold_in(key, 1))
    sampler = FusionSampler(table, cfg, mock_unet,
                            decode_preview_fn=lambda x0: x0, segment_fn=mock_segment)
    out = sampler.run(embeds, jax.random.fold_in(key, 2))
    want = reference_trajectory(table, cfg, embeds,
                                sampler.init_latent(jax.random.fold_in(key, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_precomputed_masks_path():
    """The fg_masks shortcut (reference's mask-JPG path) must bypass
    segmentation entirely."""
    cfg = FusionConfig(n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8,
                       resampling_steps=0, jumping_steps=0)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(4)
    embeds = make_embeds(jax.random.fold_in(key, 1))
    sampler = FusionSampler(table, cfg, mock_unet)  # no decode/segment fns
    fg = jnp.zeros((N - 1, H * 8, W * 8)).at[0, : H * 4].set(1.0).at[1, H * 4 :].set(1.0)
    out = sampler.run(embeds, jax.random.fold_in(key, 2), fg_masks=fg)
    assert out.shape == (1, H, W, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_seed_batched_rows_match_single_runs():
    """num_seeds>1 batches independent trajectories: row s of the batched
    phases must equal the single-seed phases run on that row alone (the
    mock UNet is row-local, so this is near-exact)."""
    cfg = FusionConfig(n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8,
                       resampling_steps=2, jumping_steps=2)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(5)
    embeds = make_embeds(jax.random.fold_in(key, 1))
    sampler = FusionSampler(table, cfg, mock_unet)
    fg = jnp.zeros((N - 1, H * 8, W * 8)).at[0, :, : W * 4].set(1.0).at[1, :, W * 4 :].set(1.0)
    masks = sampler.compute_masks(None, fg)

    x0 = sampler.init_latent(jax.random.fold_in(key, 2), num_seeds=3)

    def run_from(x):
        x, _ = sampler.prologue(None, embeds, x)
        x, _ = sampler.joint_scan(None, embeds, x, 1, cfg.t_cond_idx)
        x = sampler.fused_scan(None, embeds, x, masks, cfg.t_cond_idx, cfg.n_timesteps)
        return x

    batched = run_from(x0)
    assert batched.shape == (3, H, W, 4)
    for s in range(3):
        single = run_from(x0[s : s + 1])
        np.testing.assert_allclose(
            np.asarray(batched[s : s + 1]), np.asarray(single), rtol=1e-4, atol=1e-5,
            err_msg=f"seed row {s}",
        )


def test_multi_prompt_seed_rows_match_single_runs():
    """Multi-prompt batching: seed row s of one batched trajectory driven by
    stacked per-seed TextEmbeds must equal a single-seed trajectory run with
    prompt set s alone (the BASELINE batched multi-prompt serving config)."""
    from tweediemix_tpu.fusion.pipeline import stack_text_embeds

    cfg = FusionConfig(n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8,
                       resampling_steps=2, jumping_steps=2)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(11)
    embeds_list = [make_embeds(jax.random.fold_in(key, 100 + s)) for s in range(3)]
    stacked = stack_text_embeds(embeds_list)
    assert stacked.joint_ctx.shape == (2, 3, S_CTX, D_CTX)

    def row_local_unet(params, x, t, ctx, pooled, concept_idx):
        # like mock_unet but strictly row-local (a real UNet never mixes
        # batch rows; mock_unet's global mean(ctx) would)
        tag = pooled[:, 0][:, None, None, None]
        idx = concept_idx.astype(jnp.float32)[:, None, None, None]
        tf = jnp.asarray(t, jnp.float32) / 1000.0
        row_ctx = jnp.mean(ctx, axis=(1, 2))[:, None, None, None]
        return jnp.tanh(0.3 * x) * (1.0 + 0.03 * tag) + 0.01 * tf + 0.02 * idx + 0.001 * row_ctx

    sampler = FusionSampler(table, cfg, row_local_unet)
    fg = jnp.zeros((N - 1, H * 8, W * 8)).at[0, :, : W * 4].set(1.0).at[1, :, W * 4 :].set(1.0)
    masks = sampler.compute_masks(None, fg)
    x0 = sampler.init_latent(jax.random.fold_in(key, 2), num_seeds=3)

    def run_from(x, e):
        x, _ = sampler.prologue(None, e, x)
        x, _ = sampler.joint_scan(None, e, x, 1, cfg.t_cond_idx)
        preview = sampler.jumping(None, e, x)
        x = sampler.fused_scan(None, e, x, masks, cfg.t_cond_idx, cfg.n_timesteps)
        return x, preview

    batched, preview_b = run_from(x0, stacked)
    assert batched.shape == (3, H, W, 4)
    for s in range(3):
        single, preview_s = run_from(x0[s : s + 1], embeds_list[s])
        np.testing.assert_allclose(
            np.asarray(batched[s : s + 1]), np.asarray(single), rtol=1e-4, atol=1e-5,
            err_msg=f"seed row {s}",
        )
        np.testing.assert_allclose(
            np.asarray(preview_b[s : s + 1]), np.asarray(preview_s), rtol=1e-4, atol=1e-5,
        )
    # distinct prompts actually produce distinct rows
    assert float(jnp.max(jnp.abs(batched[0] - batched[1]))) > 1e-4


def test_init_latent_rows_independent_of_batch():
    cfg = FusionConfig(n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    sampler = FusionSampler(table, cfg, mock_unet)
    key = jax.random.PRNGKey(9)
    a = sampler.init_latent(key, num_seeds=1)
    b = sampler.init_latent(key, num_seeds=4)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)
