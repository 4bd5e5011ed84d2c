"""DDIM timestep/alpha tables with the TweedieMix conventions, as pure data.

The reference drives sampling off a mutated diffusers ``DDIMScheduler``
(``fusion_generation/fusion_sampling.py:212-218``): it prepends ``1.0`` to
``alphas_cumprod`` (shifting the table so ``alpha(t)`` reads the cumulative
product *up to* ``t-1``), keeps ``final_alpha_cumprod`` for ``t < 0``, and
steps with ``skip = num_train_timesteps // n_timesteps``. Tweedie estimates
and re-noising are open-coded (``fusion_sampling.py:385,428,430``).

Here the whole schedule is a frozen pytree of jnp arrays: every quantity a
jitted ``lax.scan`` step needs is precomputed host-side, so the scanned body
contains only gathers and FMAs (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    schedule: str = "scaled_linear",
) -> np.ndarray:
    """Beta schedule; defaults match the SDXL DDIMScheduler config."""
    if schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    raise ValueError(f"unknown beta schedule {schedule!r}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMTable:
    """Precomputed DDIM schedule with the TweedieMix alpha-shift convention.

    Attributes:
      timesteps: int32[S] descending sampling timesteps (e.g. 981..1 for 50
        steps with ``steps_offset=1``).
      alphas_cumprod: fp32[T+1]; entry 0 is the prepended 1.0, so
        ``alphas_cumprod[t]`` == original cumulative alpha at ``t-1``
        (mirrors ``fusion_sampling.py:218``).
      final_alpha_cumprod: fp32[] used for ``t < 0``
        (``fusion_sampling.py:305-307``).
      skip: static python int, ``num_train_timesteps // n_steps``.
      init_noise_sigma: fp32[] initial latent scale (1.0 for DDIM).
    """

    timesteps: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    skip: int = dataclasses.field(metadata=dict(static=True))
    init_noise_sigma: float = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        n_steps: int = 50,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        schedule: str = "scaled_linear",
        steps_offset: int = 1,
        set_alpha_to_one: bool = False,
    ) -> "DDIMTable":
        betas = make_betas(num_train_timesteps, beta_start, beta_end, schedule)
        acp = np.cumprod(1.0 - betas)
        final = 1.0 if set_alpha_to_one else float(acp[0])
        skip = num_train_timesteps // n_steps
        # diffusers "leading" spacing + steps_offset, as used by SDXL.
        ts = (np.arange(0, n_steps) * skip).round()[::-1].astype(np.int64) + steps_offset
        shifted = np.concatenate([[1.0], acp])
        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(shifted, dtype=jnp.float32),
            final_alpha_cumprod=jnp.float32(final),
            skip=skip,
            init_noise_sigma=1.0,
        )

    @property
    def n_steps(self) -> int:
        return int(self.timesteps.shape[0])

    def alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        """ā(t) with the shifted table; t may be a traced scalar; t<0 → final."""
        t = jnp.asarray(t)
        safe_t = jnp.clip(t, 0, self.alphas_cumprod.shape[0] - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)

    def tweedie(self, x: jnp.ndarray, eps: jnp.ndarray, at: jnp.ndarray) -> jnp.ndarray:
        """x0-hat = (x - sqrt(1-ā)·eps) / sqrt(ā)  (``fusion_sampling.py:428``)."""
        at = at.astype(jnp.float32)
        return (x - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)

    def renoise(self, x0: jnp.ndarray, eps: jnp.ndarray, at_next: jnp.ndarray) -> jnp.ndarray:
        """x_{t-1} = sqrt(ā_next)·x0 + sqrt(1-ā_next)·eps (``fusion_sampling.py:430``).

        The fusion sampler always re-noises with the *unconditional* eps.
        """
        at_next = at_next.astype(jnp.float32)
        return jnp.sqrt(at_next) * x0 + jnp.sqrt(1.0 - at_next) * eps


def cfg(eps_uncond: jnp.ndarray, eps_cond: jnp.ndarray, scale) -> jnp.ndarray:
    """Classifier-free guidance combine (``fusion_sampling.py:383``)."""
    return eps_uncond + scale * (eps_cond - eps_uncond)


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale=0.0):
    """CFG rescale of arXiv 2305.08891 §3.4 (``fusion_sampling.py:17-28``)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def video_rotation_step(
    x: jnp.ndarray,
    eps_pred: jnp.ndarray,
    at: jnp.ndarray,
    at_next: jnp.ndarray,
) -> jnp.ndarray:
    """The I2VGen-XL custom "angle rotation" DDIM step.

    Mirrors ``video_gen/pipeline_i2vgen_xl.py:707-719``: instead of the
    standard scheduler step, the (x_t, eps) pair is treated as an orthogonal
    basis rotation:

        eps_rot = sqrt(ā)·eps_pred + sqrt(1-ā)·x_t
        x0      = sqrt(ā)·x_t     - sqrt(1-ā)·eps_pred
        x_next  = sqrt(ā_next)·x0 + sqrt(1-ā_next)·eps_rot
    """
    at = at.astype(jnp.float32)
    at_next = at_next.astype(jnp.float32)
    sa, sb = jnp.sqrt(at), jnp.sqrt(1.0 - at)
    eps_rot = sa * eps_pred + sb * x
    x0 = sa * x - sb * eps_pred
    return jnp.sqrt(at_next) * x0 + jnp.sqrt(1.0 - at_next) * eps_rot


def add_noise(
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
    alphas_cumprod_unshifted: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) for training (standard convention,
    matching diffusers ``scheduler.add_noise`` used at
    ``concept_training/diffusers_training_xl_new.py:966-974``)."""
    at = alphas_cumprod_unshifted[t].astype(jnp.float32)
    while at.ndim < x0.ndim:
        at = at[..., None]
    return jnp.sqrt(at) * x0 + jnp.sqrt(1.0 - at) * noise


def training_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    schedule: str = "scaled_linear",
) -> jnp.ndarray:
    """Unshifted ā table (index t = original t) for the training loss."""
    return jnp.asarray(
        np.cumprod(1.0 - make_betas(num_train_timesteps, beta_start, beta_end, schedule)),
        dtype=jnp.float32,
    )
