"""Multi-concept Tweedie fusion sampling as jitted scans.

This is the TPU-native rebuild of the reference's hot loop
(``fusion_generation/fusion_sampling.py:309-530`` and the LoRA variant's
``t_stop`` window, ``fusion_sampling_lora.py:324,378,476-490``):

* Phase A (joint): batch-2 [uncond, multi-concept] CFG steps, with a
  step-0 prologue that runs the batch-(N+1) forward and the *resampling*
  loop (composed Tweedie ``(N-1)·x0_multi − Σ x0_single``, re-noise to
  next_t with uncond eps, one joint forward there, Tweedie back up —
  ``fusion_sampling.py:388-415``).
* Boundary (t == t_cond_prev): *jumping* steps (joint forwards marching
  ``t −= 150`` for a clean Tweedie preview, ``:431-447``), preview decode,
  segmentation, region-mask build. The reference shells out to a second GPU
  and round-trips JPGs (``:456-469``); here the boundary is a host callback
  seam between two jitted scans and masks stay on device.
* Phase B (fused): batch-(N+1) [uncond, concept_1..N] forwards where
  ``concept_idx`` selects stacked K/V (or LoRA) weights per row; per-concept
  CFG; fused Tweedie ``x0 = Σ mask_cc ⊙ x0_cc`` (``:378-385``); re-noise
  with the unconditional eps (``:430``). The final step returns the Tweedie
  itself (``:471-472``).

Everything is static-shape: phase boundaries are step *indices* computed at
trace time, so each scan compiles once per config.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tweediemix_tpu.fusion.masks import build_region_masks
from tweediemix_tpu.schedulers.ddim import DDIMTable, cfg as cfg_combine


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Sampling hyperparameters (flag parity: ``fusion_sampling.py:533-589``)."""

    n_timesteps: int = 50
    guidance_scale: float = 0.8
    t_cond: float = 0.2
    t_stop: float = 1.0  # fusion-window end fraction; 1.0 = fuse to the end (CD)
    resampling_steps: int = 10
    jumping_steps: int = 5
    jump_stride: int = 150
    height: int = 1024
    width: int = 1024
    num_concepts: int = 3  # N, including the background concept (last)

    @property
    def latent_hw(self):
        return self.height // 8, self.width // 8

    @property
    def t_cond_idx(self) -> int:
        return int(self.n_timesteps * self.t_cond)

    @property
    def fused_end_idx(self) -> int:
        """Last fused step index (inclusive)."""
        return min(int(self.n_timesteps * self.t_stop), self.n_timesteps - 1)


class TextEmbeds(NamedTuple):
    """Precomputed prompt embeddings, row layouts fixed per phase.

    joint:   [2, T, D] = [uncond, multi-concept prompt]
    single:  [N-1, T, D] = per-concept single prompts (no background)
    concept: [N+1, T, D] = [uncond, concept_1 .. concept_N]
    (each with matching pooled [., P])

    Multi-prompt seed batching: every leaf may carry an extra per-seed axis
    at position 1 ([K, S, T, D] / [K, S, P]) so the S seeds of one batched
    trajectory sample S *different* prompt sets (the BASELINE "batched
    multi-prompt pipeline" serving config). Build with
    ``fusion.pipeline.stack_text_embeds``.
    """

    joint_ctx: jnp.ndarray
    joint_pooled: jnp.ndarray
    single_ctx: jnp.ndarray
    single_pooled: jnp.ndarray
    concept_ctx: jnp.ndarray
    concept_pooled: jnp.ndarray


def _rows(a: jnp.ndarray, s: int, base_ndim: int) -> jnp.ndarray:
    """Embed-major/seed-minor UNet rows (row k*S+s = embed k, seed s).

    Shared embeds ([K, ...], ndim == base_ndim) repeat per seed; per-seed
    embeds ([K, S, ...]) reshape directly into the same row order."""
    if a.ndim == base_ndim:
        return jnp.repeat(a, s, axis=0)
    assert a.ndim == base_ndim + 1 and a.shape[1] == s, (a.shape, s)
    return a.reshape(a.shape[0] * s, *a.shape[2:])


# unet_fn: (params, x [B,h,w,4] fp32, t int32, ctx [B,S,D], pooled [B,P],
# concept_idx int32 [B]) -> eps [B,h,w,4] fp32. ``params`` is threaded
# explicitly through every jitted phase — closing over a 2.5B-param pytree
# would bake it into each compiled graph as constants (one full copy per
# phase graph).
UNetFn = Callable[..., jnp.ndarray]


class FusionSampler:
    def __init__(
        self,
        table: DDIMTable,
        config: FusionConfig,
        unet_fn: UNetFn,
        unet_params=None,
        decode_preview_fn: Optional[Callable] = None,
        segment_fn: Optional[Callable] = None,
        kv_builder: Optional[Callable] = None,
    ):
        assert table.n_steps == config.n_timesteps
        assert 1 <= config.t_cond_idx < config.n_timesteps
        self.table = table
        self.config = config
        self.unet_fn = unet_fn
        self.unet_params = unet_params
        self.decode_preview_fn = decode_preview_fn
        self.segment_fn = segment_fn
        # optional (params, ctx_rows, concept_idx) -> cross-attention K/V
        # cache (models.unet2d.precompute_cross_kv): the text context is
        # loop-invariant, so each phase builds its row-layout's cache once
        # outside the scan and the scan body skips the stacked-weight
        # gather + K/V projections entirely
        self.kv_builder = kv_builder
        # jit once; re-wrapping per call would defeat the compile cache
        self._jit_prologue = jax.jit(self.prologue)
        self._jit_joint = jax.jit(self.joint_scan, static_argnames=("start", "stop"))
        self._jit_jumping = jax.jit(self.jumping)
        self._jit_fused = jax.jit(self.fused_scan, static_argnames=("start", "stop"))

    # -- helpers -----------------------------------------------------------

    # Throughout, ``x`` carries a leading seed axis [S, h, w, 4] (S >= 1):
    # the "8 seeds in parallel" serving layout. Prompt-embedding rows are
    # repeated per seed so UNet row k*S+s pairs embed-row k with seed s, and
    # eps group k is eps[k*S:(k+1)*S].

    def _call_unet(self, params, xin, t, ctx, pooled, idx, kv):
        if kv is None:
            return self.unet_fn(params, xin, t, ctx, pooled, idx)
        return self.unet_fn(params, xin, t, ctx, pooled, idx, cross_kv=kv)

    def _joint_rows(self, embeds: TextEmbeds, s: int):
        return (
            _rows(embeds.joint_ctx, s, 3),
            _rows(embeds.joint_pooled, s, 2),
            jnp.zeros((2 * s,), jnp.int32),
        )

    def _joint_kv(self, params, embeds: TextEmbeds, s: int):
        if self.kv_builder is None:
            return None
        ctx, _, idx = self._joint_rows(embeds, s)
        return self.kv_builder(params, ctx, idx)

    def _joint_eps(self, params, embeds: TextEmbeds, x, t, kv=None):
        s = x.shape[0]
        xin = jnp.concatenate([x, x], axis=0)
        ctx, pooled, idx = self._joint_rows(embeds, s)
        eps = self._call_unet(params, xin, t, ctx, pooled, idx, kv)
        return eps[:s], eps[s:]

    def _prologue_rows(self, embeds: TextEmbeds, s: int):
        n = self.config.num_concepts
        # joint/single leaves may disagree on the per-seed axis; _rows
        # normalizes each before concatenation
        ctx = jnp.concatenate(
            [_rows(embeds.joint_ctx, s, 3), _rows(embeds.single_ctx, s, 3)], axis=0
        )
        pooled = jnp.concatenate(
            [_rows(embeds.joint_pooled, s, 2), _rows(embeds.single_pooled, s, 2)], axis=0
        )
        return ctx, pooled, jnp.zeros(((n + 1) * s,), jnp.int32)

    def _prologue_eps(self, params, embeds: TextEmbeds, x, t, kv=None):
        n = self.config.num_concepts
        s = x.shape[0]
        ctx, pooled, idx = self._prologue_rows(embeds, s)
        xin = jnp.concatenate([x] * (n + 1), axis=0)
        return self._call_unet(params, xin, t, ctx, pooled, idx, kv)

    # -- phases ------------------------------------------------------------

    def prologue(self, params, embeds: TextEmbeds, x):
        """Step 0: batch-(N+1) forward + resampling (fusion_sampling.py:347-423)."""
        cfg = self.config
        tbl = self.table
        g = cfg.guidance_scale
        n = cfg.num_concepts
        t = tbl.timesteps[0]
        at, at_next = tbl.alpha(t), tbl.alpha(t - tbl.skip)

        s = x.shape[0]
        kv_pro = None
        kv_joint = None
        if self.kv_builder is not None:
            pctx, _, pidx = self._prologue_rows(embeds, s)
            kv_pro = self.kv_builder(params, pctx, pidx)
            kv_joint = self._joint_kv(params, embeds, s)

        eps = self._prologue_eps(params, embeds, x, t, kv=kv_pro)

        def resample(carry, _):
            x, eps = carry
            eps_u = eps[:s]
            eps_m = cfg_combine(eps_u, eps[s : 2 * s], g)
            x0 = (n - 1) * tbl.tweedie(x, eps_m, at)
            for cc in range(n - 1):
                eps_s = cfg_combine(eps_u, eps[(2 + cc) * s : (3 + cc) * s], g)
                x0 = x0 - tbl.tweedie(x, eps_s, at)
            x_next = tbl.renoise(x0, eps_u, at_next)
            eu2, ec2 = self._joint_eps(params, embeds, x_next, t - tbl.skip, kv=kv_joint)
            eps_next = cfg_combine(eu2, ec2, g)
            x0_next = tbl.tweedie(x_next, eps_next, at_next)
            x_back = tbl.renoise(x0_next, eu2, at)  # back up to t with uncond eps
            eps_new = self._prologue_eps(params, embeds, x_back, t, kv=kv_pro)
            return (x_back, eps_new), None

        if cfg.resampling_steps > 0:
            (x, eps), _ = jax.lax.scan(resample, (x, eps), None, length=cfg.resampling_steps)

        eps_u = eps[:s]
        eps_j = cfg_combine(eps_u, eps[s : 2 * s], g)
        x0 = tbl.tweedie(x, eps_j, at)
        return tbl.renoise(x0, eps_u, at_next), x0

    def joint_scan(self, params, embeds: TextEmbeds, x, start: int, stop: int):
        """Joint CFG steps for indices [start, stop); returns (x, last x0).

        The final trajectory step (index n_timesteps-1, t==1) returns the
        Tweedie instead of re-noising (fusion_sampling.py:471-472).
        """
        cfg = self.config
        tbl = self.table
        if stop <= start:
            return x, None
        ts = tbl.timesteps[start:stop]
        is_final = jnp.arange(start, stop) == (cfg.n_timesteps - 1)
        kv = self._joint_kv(params, embeds, x.shape[0])

        def step(x, inp):
            t, final = inp
            eps_u, eps_c = self._joint_eps(params, embeds, x, t, kv=kv)
            eps = cfg_combine(eps_u, eps_c, cfg.guidance_scale)
            x0 = tbl.tweedie(x, eps, tbl.alpha(t))
            x_next = tbl.renoise(x0, eps_u, tbl.alpha(t - tbl.skip))
            x_next = jnp.where(final, x0, x_next)
            return x_next, x0

        x, x0s = jax.lax.scan(step, x, (ts, is_final))
        return x, x0s[-1]

    def jumping(self, params, embeds: TextEmbeds, x):
        """Jumping Tweedie preview (fusion_sampling.py:431-447): from the
        latent after the boundary step, march joint forwards with
        t -= jump_stride; return the final Tweedie x0."""
        cfg = self.config
        tbl = self.table
        t0 = tbl.timesteps[cfg.t_cond_idx]
        kv = self._joint_kv(params, embeds, x.shape[0])

        def body(carry, j):
            x, _ = carry
            tt = t0 - j * cfg.jump_stride
            eps_u, eps_c = self._joint_eps(params, embeds, x, tt, kv=kv)
            eps = cfg_combine(eps_u, eps_c, cfg.guidance_scale)
            x0 = tbl.tweedie(x, eps, tbl.alpha(tt))
            x_next = tbl.renoise(x0, eps_u, tbl.alpha(tt - cfg.jump_stride))
            return (x_next, x0), None

        (x, x0), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x)), jnp.arange(cfg.jumping_steps)
        )
        return x0

    def fused_scan(self, params, embeds: TextEmbeds, x, masks, start: int, stop: int):
        """Masked Tweedie fusion steps for indices [start, stop)
        (fusion_sampling.py:324-340,378-385).

        masks: [N, h, w] region masks (foregrounds..., background last).
        """
        cfg = self.config
        tbl = self.table
        n = cfg.num_concepts
        if stop <= start:
            return x
        ts = tbl.timesteps[start:stop]
        is_final = jnp.arange(start, stop) == (cfg.n_timesteps - 1)
        s = x.shape[0]
        concept_idx = jnp.repeat(jnp.arange(n + 1, dtype=jnp.int32), s)
        # masks: [N, h, w] (shared) or [S, N, h, w] (per-seed)
        if masks.ndim == 3:
            m = masks[:, None, :, :, None]  # [N, 1, h, w, 1]
        else:
            m = masks.transpose(1, 0, 2, 3)[..., None]  # [N, S, h, w, 1]

        ctx_rows = _rows(embeds.concept_ctx, s, 3)
        pooled_rows = _rows(embeds.concept_pooled, s, 2)
        kv = (
            None if self.kv_builder is None
            else self.kv_builder(params, ctx_rows, concept_idx)
        )

        def step(x, inp):
            t, final = inp
            xin = jnp.concatenate([x] * (n + 1), axis=0)
            eps = self._call_unet(
                params, xin, t, ctx_rows, pooled_rows, concept_idx, kv
            )
            eps_u = eps[:s]
            at = tbl.alpha(t)
            eps_cc = cfg_combine(eps_u, eps[s:].reshape(n, s, *x.shape[1:]), cfg.guidance_scale)
            x0_cc = tbl.tweedie(x[None], eps_cc, at)  # [N, S, h, w, 4]
            x0 = jnp.sum(m * x0_cc, axis=0)  # [S, h, w, 4]
            x_next = tbl.renoise(x0, eps_u, tbl.alpha(t - tbl.skip))
            x_next = jnp.where(final, x0, x_next)
            return x_next, None

        x, _ = jax.lax.scan(step, x, (ts, is_final))
        return x

    # -- end to end ---------------------------------------------------------

    def init_latent(self, key, num_seeds: int = 1):
        """[S, h, w, 4]; each seed row from an independent fold of ``key``
        so row s is reproducible regardless of batch size."""
        h, w = self.config.latent_hw
        keys = jax.random.split(key, num_seeds)
        rows = [jax.random.normal(k, (h, w, 4), jnp.float32) for k in keys]
        return jnp.stack(rows) * self.table.init_noise_sigma

    def run(self, embeds: TextEmbeds, key, fg_masks: Optional[jnp.ndarray] = None,
            num_seeds: int = 1, x_init: Optional[jnp.ndarray] = None):
        """Full trajectory. ``fg_masks`` (image-res [N-1, H, W]) may be
        supplied to skip the in-loop segmentation (the reference's
        precomputed-mask path via mask JPGs, fusion_sampling.py:461-466).
        ``num_seeds`` > 1 samples that many seeds batched through every
        forward (the v5e-8 "seeds in parallel" serving config). ``x_init``
        overrides the initial latent (multi-host serving stamps the
        deterministic ``init_latent`` output with a global replicated
        sharding first — ``parallel/mesh.py::globalize``).

        Returns the final latent x0 [S, h, w, 4] (pre-VAE-decode).
        """
        cfg = self.config
        params = self.unet_params
        x = self.init_latent(key, num_seeds) if x_init is None else x_init
        x, x0 = self._jit_prologue(params, embeds, x)
        x, x0_last = self._jit_joint(params, embeds, x, start=1, stop=cfg.t_cond_idx)
        if x0_last is None:
            x0_last = x0

        if cfg.jumping_steps > 0:
            preview_x0 = self._jit_jumping(params, embeds, x)
        else:
            preview_x0 = x0_last

        masks = self.compute_masks(preview_x0, fg_masks)

        x = self._jit_fused(
            params, embeds, x, masks, start=cfg.t_cond_idx, stop=cfg.fused_end_idx + 1
        )
        if cfg.fused_end_idx + 1 < cfg.n_timesteps:
            # LoRA t_stop tail: back to joint CFG (fusion_sampling_lora.py:324)
            x, _ = self._jit_joint(
                params, embeds, x, start=cfg.fused_end_idx + 1, stop=cfg.n_timesteps
            )
        return x

    def compute_masks(self, preview_x0, fg_masks: Optional[jnp.ndarray]):
        """Region masks: [N, h, w] shared across seeds (precomputed path) or
        [S, N, h, w] per seed (in-loop segmentation of each seed's preview —
        fusion_sampling.py:453-469)."""
        cfg = self.config
        h, w = cfg.latent_hw
        if fg_masks is not None:
            fg_masks = jnp.asarray(fg_masks)
            assert fg_masks.shape[0] == cfg.num_concepts - 1, fg_masks.shape
            return build_region_masks(fg_masks, h, w)
        if self.decode_preview_fn is None or self.segment_fn is None:
            raise ValueError("no fg_masks supplied and no decode/segment fns configured")
        per_seed = []
        for si in range(preview_x0.shape[0]):
            preview_img = self.decode_preview_fn(preview_x0[si : si + 1])
            fg = jnp.asarray(self.segment_fn(preview_img))
            assert fg.shape[0] == cfg.num_concepts - 1, fg.shape
            per_seed.append(build_region_masks(fg, h, w))
        masks = jnp.stack(per_seed)  # [S, N, h, w]
        return masks[0] if masks.shape[0] == 1 else masks
