"""Single-concept personalization training (Custom Diffusion / LoRA).

Rebuild of ``concept_training/diffusers_training_xl_new.py`` (and the LoRA
variant) as a pure jitted train step:

* trainable-parameter selection is an optax mask pytree instead of
  ``requires_grad`` surgery (``create_custom_diffusion``, reference
  :68-98): ``crossattn_kv`` trains only attn2 to_k/to_v, ``crossattn``
  trains all attn2 params, ``lora`` trains only LoRA factors;
* the diffusion loss is the reference's masked MSE
  ``((loss·mask).sum / mask.sum).mean`` over instance rows plus
  ``prior_loss_weight ·`` plain MSE over class/prior rows (reference
  :1014-1038), with per-row random timesteps;
* grad clipping on the trainable subset (reference :1061-1067) via
  ``optax.clip_by_global_norm`` inside the masked chain;
* data parallelism is jit + sharding annotations over a ``dp`` mesh axis
  (replacing accelerate DDP, reference :503-508,913-920).

The Custom-Diffusion first-token K/V detach trick lives in the model
(``UNetConfig.detach_first_token_kv``, see models/unet2d.py), mirroring
``diffusers_model_pipeline_xl_new.py:93-97``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (defaults mirror singleconcept_train.sh:5-21)."""

    learning_rate: float = 1e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    prior_loss_weight: float = 1.0
    with_prior_preservation: bool = True
    freeze_model: str = "crossattn_kv"  # crossattn_kv | crossattn | lora
    num_train_timesteps: int = 1000
    # int8 blockwise moment state (the reference's bitsandbytes AdamW8bit,
    # --use_8bit_adam in singleconcept_train.sh:20)
    use_8bit_adam: bool = False


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def trainable_mask(params, freeze_model: str = "crossattn_kv"):
    """Bool pytree marking trainable leaves.

    crossattn_kv: attn2 to_k/to_v kernels (reference create_custom_diffusion
    :68-98 with freeze_model='crossattn_kv').
    crossattn: every attn2 param.
    lora: every stacked LoRA factor (the AttnProcsLayers equivalent of
    diffusers_training_xl_lora.py:897-899).
    """
    flat = traverse_util.flatten_dict(params)

    def is_trainable(path):
        if freeze_model == "crossattn_kv":
            return (
                len(path) >= 3
                and path[-3] == "attn2"
                and path[-2] in ("to_k", "to_v")
                and path[-1] == "kernel"
            )
        if freeze_model == "crossattn":
            return "attn2" in path
        if freeze_model == "lora":
            return "_lora_" in path[-1]
        raise ValueError(freeze_model)

    return traverse_util.unflatten_dict({p: is_trainable(p) for p in flat})


def make_optimizer(cfg: TrainConfig, mask):
    """clip+AdamW on trainable leaves, zero updates for frozen ones.

    Note optax.masked passes unmasked grads through *unchanged*, which would
    apply raw gradients to frozen params — multi_transform with set_to_zero
    is the correct freeze."""
    if cfg.use_8bit_adam:
        from tweediemix_tpu.training.adam8bit import adamw8bit

        adam = adamw8bit(
            learning_rate=cfg.learning_rate,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    else:
        adam = optax.adamw(
            learning_rate=cfg.learning_rate,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    inner = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adam)
    labels = jax.tree.map(lambda on: "train" if on else "freeze", mask)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )


def diffusion_loss(
    model_apply,
    params,
    batch: Dict[str, jnp.ndarray],
    rng,
    acp: jnp.ndarray,
    cfg: TrainConfig,
):
    """Masked-MSE diffusion loss on eps prediction.

    batch keys:
      latents: [B, h, w, 4] (already VAE-encoded and scaled)
      mask: [B, h, w, 1] latent-res validity mask (random-scale paste aug)
      ctx: [B, S, D], pooled: [B, P], time_ids: [B, 6]
      is_prior: float [B], 1.0 for class/regularization rows
    """
    latents = batch["latents"]
    b = latents.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, cfg.num_train_timesteps)
    noise = jax.random.normal(rng_n, latents.shape, latents.dtype)

    at = acp[t].astype(jnp.float32)[:, None, None, None]
    noisy = jnp.sqrt(at) * latents + jnp.sqrt(1.0 - at) * noise

    pred = model_apply(params, noisy, t, batch["ctx"], batch["pooled"], batch["time_ids"])
    se = (pred - noise) ** 2  # eps-prediction target

    mask = batch["mask"]
    axes = (1, 2, 3)
    masked_mse = jnp.sum(se * mask, axis=axes) / jnp.maximum(jnp.sum(mask, axis=axes), 1.0)
    plain_mse = jnp.mean(se, axis=axes)

    is_prior = batch.get("is_prior")
    if is_prior is None or not cfg.with_prior_preservation:
        return jnp.mean(masked_mse), {"loss": jnp.mean(masked_mse)}
    inst_w = 1.0 - is_prior
    inst_loss = jnp.sum(masked_mse * inst_w) / jnp.maximum(jnp.sum(inst_w), 1.0)
    prior_loss = jnp.sum(plain_mse * is_prior) / jnp.maximum(jnp.sum(is_prior), 1.0)
    total = inst_loss + cfg.prior_loss_weight * prior_loss
    return total, {"loss": total, "instance_loss": inst_loss, "prior_loss": prior_loss}


def make_train_step(model, cfg: TrainConfig, acp: jnp.ndarray, optimizer):
    """Build the jittable train step. DP comes from calling this under jit
    with the batch sharded on a ``dp`` mesh axis and params replicated —
    XLA inserts the gradient all-reduce."""

    def model_apply(params, noisy, t, ctx, pooled, time_ids):
        return model.apply({"params": params}, noisy, t, ctx, pooled, time_ids)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: diffusion_loss(model_apply, p, batch, rng, acp, cfg),
            has_aux=True,
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step


def init_state(params, optimizer) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=optimizer.init(params))
