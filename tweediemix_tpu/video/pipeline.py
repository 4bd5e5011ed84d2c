"""Image-to-video pipeline with first-frame feature injection.

Rebuild of the reference's modified I2VGen-XL pipeline
(``video_gen/pipeline_i2vgen_xl.py:484-741`` + ``run_video.py``):

* CLIP image embedding of the conditioning image (zeros for the uncond
  CFG row, ``:300-330``) and first-frame VAE latent with the linear
  frame-position ramp (``:421-451``);
* 50-step loop with CFG 9 and the custom *angle-rotation* DDIM step
  (``:707-719``; ``schedulers.ddim.video_rotation_step``) over an
  UNSHIFTED alpha table (``:480-482`` — unlike the fusion sampler the
  video pipeline does not prepend 1.0);
* first-frame conv injection on the first ``injection_timestep`` fraction
  of steps (``:653-656``), hard-copy at the mid resnets and
  ``interp_ratio`` blending at up level 1 (``video_gen/utils_attn.py``) —
  here per-step flag arrays consumed by the jitted scan;
* chunked per-frame VAE decode (``:332-352``) via ``lax.map``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.models.unet3d import UNet3DConditionModel, precompute_video_cache
from tweediemix_tpu.models.vae import postprocess_image, scale_latents, unscale_latents
from tweediemix_tpu.schedulers.ddim import (
    cfg as cfg_combine,
    make_betas,
    video_rotation_step,
)


@dataclasses.dataclass(frozen=True)
class VideoConfig:
    """Defaults mirror run_video.py:26-40."""

    n_timesteps: int = 50
    guidance_scale: float = 9.0
    num_frames: int = 16
    height: int = 512
    width: int = 512
    fps: int = 8
    injection_timestep: float = 0.02  # fraction of steps with injection
    interp_ratio: float = 0.7
    decode_chunk_size: int = 1
    latent_factor: int = 8  # the VAE's spatial downscale (tiny test VAEs: 2)
    # scheduler (configurable: the I2VGen checkpoint ships its own config)
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1

    @property
    def latent_hw(self):
        return self.height // self.latent_factor, self.width // self.latent_factor

    @property
    def injection_steps(self) -> int:
        return int(self.n_timesteps * self.injection_timestep)


class VideoDDIM:
    """Unshifted alpha table (pipeline_i2vgen_xl.py:480-482,646-652)."""

    def __init__(self, cfg: VideoConfig):
        acp = np.cumprod(
            1.0 - make_betas(cfg.num_train_timesteps, cfg.beta_start, cfg.beta_end, cfg.beta_schedule)
        )
        self.acp = jnp.asarray(acp, jnp.float32)
        self.final_alpha_cumprod = jnp.float32(acp[0])
        self.skip = cfg.num_train_timesteps // cfg.n_timesteps
        ts = (np.arange(cfg.n_timesteps) * self.skip).round()[::-1].astype(np.int64)
        self.timesteps = jnp.asarray(ts + cfg.steps_offset, jnp.int32)

    def alpha(self, t):
        t = jnp.asarray(t)
        safe = jnp.clip(t, 0, self.acp.shape[0] - 1)
        return jnp.where(t >= 0, self.acp[safe], self.final_alpha_cumprod)


class I2VPipeline:
    """unet_fn(params, x [2B,F,h,w,4], t, ctx [2B,S,D], image_latents,
    image_emb, fps, inject_copy, inject_interp) → eps."""

    def __init__(self, config: VideoConfig, unet: UNet3DConditionModel, unet_params,
                 vae, vae_params):
        self.config = config
        self.table = VideoDDIM(config)
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self._jit_loop = jax.jit(self._loop)

    # -- conditioning ---------------------------------------------------------

    def prepare_image_latents(self, image_latent_frame0: jnp.ndarray) -> jnp.ndarray:
        """frame0 latent [B, h, w, 4] → [B, F, h, w, 4] with the position
        ramp (pipeline_i2vgen_xl.py:421-451)."""
        cfg = self.config
        b = image_latent_frame0.shape[0]
        frames = [image_latent_frame0[:, None]]
        for idx in range(cfg.num_frames - 1):
            scale = (idx + 1) / (cfg.num_frames - 1)
            frames.append(jnp.ones_like(frames[0]) * scale)
        return jnp.concatenate(frames, axis=1)

    def encode_first_frame(self, image: jnp.ndarray, rng) -> jnp.ndarray:
        """[B, H, W, 3] in [-1, 1] → scaled latent [B, h, w, 4].

        The VAE posterior noise is drawn per row (row 0 from ``rng``, row
        b from ``fold_in(rng, 1000 + b)`` — the same convention as the
        init latents), so every clip's noise stream is invariant to the
        batch size it is generated at."""
        mean, logvar = self.vae.apply(
            {"params": self.vae_params}, image, method=self.vae.encode
        )
        noise = jnp.stack([
            jax.random.normal(
                rng if bi == 0 else jax.random.fold_in(rng, 1000 + bi),
                mean.shape[1:], jnp.float32,
            )
            for bi in range(mean.shape[0])
        ])
        z = mean + jnp.exp(0.5 * logvar) * noise
        return scale_latents(z, self.vae.config)

    # -- sampling ---------------------------------------------------------------

    def _loop(self, unet_params, x, ctx2, image_latents2, image_emb2, fps2):
        """Rows are CLIP-INTERLEAVED: row 2i = uncond clip i, row 2i+1 =
        cond clip i — so a dp-mesh sharding of the row axis keeps each
        clip's CFG pair on one device (no cross-device resharding in the
        combine)."""
        cfg = self.config
        tbl = self.table
        k = cfg.injection_steps
        steps = jnp.arange(cfg.n_timesteps)
        inject = (steps < k).astype(jnp.float32)
        # conditioning-only work (context tokens, projected image latents,
        # every cross-attn K/V) runs once per trajectory, not once per step
        cached_ctx, cached_il, cross_kv = precompute_video_cache(
            self.unet, unet_params, ctx2, image_latents2, image_emb2, fps2,
        )

        def step(x, inp):
            t, inj = inp
            b = x.shape[0]
            xin = jnp.repeat(x, 2, axis=0)  # [2b] interleaved
            eps = self.unet.apply(
                {"params": unet_params}, xin, t, ctx2, image_latents2, image_emb2,
                fps2, inj, inj, cfg.interp_ratio,
                cached_ctx=cached_ctx, cached_il=cached_il, cross_kv=cross_kv,
            )
            er = eps.reshape(b, 2, *eps.shape[1:])
            e = cfg_combine(er[:, 0], er[:, 1], cfg.guidance_scale)
            at, at_next = tbl.alpha(t), tbl.alpha(t - tbl.skip)
            return video_rotation_step(x, e, at, at_next), None

        x, _ = jax.lax.scan(step, x, (tbl.timesteps, inject))
        return x

    def generate(
        self,
        text_ctx: jnp.ndarray,  # [1 or B, S, D] prompt context
        uncond_ctx: jnp.ndarray,  # [1 or B, S, D] negative context
        image: jnp.ndarray,  # [B, H, W, 3] in [-1, 1]
        image_embedding: jnp.ndarray,  # [1 or B, 1, D] CLIP image embed
        seed: int = 0,
        mesh_devices: int = 1,
    ) -> jnp.ndarray:
        """Returns decoded video [F, H, W, 3] (B=1) or [B, F, H, W, 3].

        B > 1 batches independent clips through every forward (the
        BASELINE "seeds in parallel" serving layout applied to the video
        stage): per-clip noise from ``fold_in(key, clip)`` so clip b is
        reproducible at any batch size. Shared ([1, ...]) prompt/
        image-embed rows broadcast across clips; pass [B, ...] rows for
        per-clip prompts (multi-prompt serving).

        ``mesh_devices`` > 1 shards the clip rows of every forward over a
        1-D dp mesh (params replicated; the interleaved row layout keeps
        each clip's CFG pair device-local, so the loop runs without
        cross-device resharding). Requires B % mesh_devices == 0.
        """
        cfg = self.config
        b = image.shape[0]
        key = jax.random.PRNGKey(seed)
        h, w = cfg.latent_hw
        # clip 0 keeps the single-clip noise stream (back-compat with the
        # B=1 path); later clips fold in their index
        x = jnp.stack([
            jax.random.normal(
                key if bi == 0 else jax.random.fold_in(key, 1000 + bi),
                (cfg.num_frames, h, w, 4), jnp.float32,
            )
            for bi in range(b)
        ])

        def rows(a):
            return a if a.shape[0] == b else jnp.repeat(a, b, axis=0)

        def interleave(uncond_rows, cond_rows):
            # row 2i = uncond clip i, row 2i+1 = cond clip i (see _loop)
            return jnp.stack([uncond_rows, cond_rows], axis=1).reshape(
                2 * b, *uncond_rows.shape[1:])

        frame0 = self.encode_first_frame(image, jax.random.fold_in(key, 1))
        img_lat = self.prepare_image_latents(frame0)
        img_lat2 = interleave(img_lat, img_lat)
        ctx2 = interleave(rows(uncond_ctx), rows(text_ctx))
        # uncond row gets a zero image embedding (reference :326-330)
        emb = rows(image_embedding)
        img_emb2 = interleave(jnp.zeros_like(emb), emb)
        fps2 = jnp.full((2 * b,), cfg.fps, jnp.float32)

        loop = self._jit_loop
        params = self.unet_params
        if mesh_devices > 1:
            assert b % mesh_devices == 0, (
                f"clip batch {b} must divide over {mesh_devices} devices")
            loop, params = self._sharded_loop(mesh_devices)
        x = loop(params, x, ctx2, img_lat2, img_emb2, fps2)
        out = self.decode_video(x)
        return out[0] if b == 1 else out

    def _sharded_loop(self, mesh_devices: int):
        """jit of _loop with clip rows sharded over a 1-D dp mesh and
        params replicated (cached per device count)."""
        cache = getattr(self, "_sharded_cache", {})
        if mesh_devices not in cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tweediemix_tpu.parallel.mesh import make_mesh, replicate

            mesh = make_mesh({"dp": mesh_devices},
                             devices=jax.devices()[:mesh_devices])
            rep = NamedSharding(mesh, P())
            row = NamedSharding(mesh, P("dp"))
            loop = jax.jit(
                self._loop,
                in_shardings=(rep, row, row, row, row, row),
                out_shardings=row,
            )
            cache[mesh_devices] = (loop, replicate(mesh, self.unet_params))
            self._sharded_cache = cache
        return cache[mesh_devices]

    def decode_video(self, latents: jnp.ndarray) -> jnp.ndarray:
        """[B, F, h, w, 4] → [B, F, H, W, 3], decoded ``decode_chunk_size``
        frames at a time (reference decode_chunk_size=1, run_video.py:39;
        larger chunks trade peak decode memory for fewer, better-utilized
        conv dispatches — tune per chip)."""
        bsz, f = latents.shape[:2]
        n = bsz * f
        z = unscale_latents(latents, self.vae.config).reshape(
            n, *latents.shape[2:]
        )
        c = min(max(1, self.config.decode_chunk_size), n)
        while n % c:  # largest divisor ≤ requested chunk keeps shapes static
            c -= 1

        def decode_chunk(frames):
            img = self.vae.apply(
                {"params": self.vae_params}, frames, method=self.vae.decode
            )
            return postprocess_image(img)

        out = jax.lax.map(decode_chunk, z.reshape(n // c, c, *z.shape[1:]))
        out = out.reshape(n, *out.shape[2:])
        return out.reshape(bsz, f, *out.shape[1:])


def export_gif(video: jnp.ndarray, path: str, fps: int = 8):
    """[F, H, W, 3] float [0,1] → animated GIF (run_video.py:40)."""
    from PIL import Image

    frames = [Image.fromarray(np.asarray(f * 255.0, np.uint8)) for f in video]
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
