"""Full personalization trainer: UNet (CD K/V or LoRA) + modifier-token
embeddings of both text towers, with delta-dict checkpointing.

Rebuild of ``concept_training/diffusers_training_xl_new.py:500-1159`` (and
the LoRA variant):

* modifier tokens are added to both tokenizers and initialized from an
  initializer token's embedding row (reference :800-858, default
  ``ktn+pll+ucd`` :444-446);
* the loss differentiates through both CLIP towers so the modifier
  embedding rows learn; gradients of every *other* embedding row are
  zeroed each step (reference :1044-1059) via a row mask;
* VAE encoding runs outside the train step with frozen params (reference
  :961-964);
* grad clip + AdamW on the trainable subset (reference :1061-1070),
  gradient accumulation via ``optax.MultiSteps``;
* ``delta-{step}.bin`` checkpoints in the reference's torch schema
  (reference :1077-1098) plus an orbax full-state checkpoint for resume —
  a capability the reference lacks (its resume block is commented out,
  :955-958).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from tweediemix_tpu.concepts.delta import save_reference_delta
from tweediemix_tpu.training.custom_diffusion import TrainConfig, trainable_mask


class FullTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Dict  # {"unet":…, "te1":…, "te2":…}
    opt_state: object


def full_trainable_mask(params, freeze_model: str, train_text_embeddings: bool,
                        train_text_encoder: bool = False):
    """Trainable-leaf mask over {"unet","te1","te2"}.

    ``train_text_encoder`` marks BOTH text towers fully trainable (the
    reference's ``--train_text_encoder``,
    ``diffusers_training_xl_new.py:301,865-869``); otherwise only the
    token-embedding tables are trainable (and only when modifier tokens
    are in play — their non-modifier rows are grad-masked in the step)."""
    unet_mask = trainable_mask(params["unet"], freeze_model)

    def te_mask(p):
        flat = traverse_util.flatten_dict(p)
        if train_text_encoder:
            return traverse_util.unflatten_dict({k: True for k in flat})
        return traverse_util.unflatten_dict(
            {k: (train_text_embeddings and k == ("token_embedding", "embedding")) for k in flat}
        )

    return {"unet": unet_mask, "te1": te_mask(params["te1"]), "te2": te_mask(params["te2"])}


def trainable_subset(params, mask) -> Dict:
    """Flat {path: leaf} dict of the trainable leaves — the pytree the
    optimizer and the grad computation run over. Differentiating only this
    subset (instead of the full tree) is the JAX equivalent of the
    reference's ``requires_grad=False`` freeze: XLA never materializes
    cotangents for the frozen 2.6B-param bulk."""
    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(mask)
    return {p: flat_p[p] for p, on in flat_m.items() if on}


def merge_subset(params, subset) -> Dict:
    """Write the trainable leaves back into the full param tree."""
    flat = dict(traverse_util.flatten_dict(params))
    flat.update(subset)
    return traverse_util.unflatten_dict(flat)


def promote_trainable_to_fp32(params, mask) -> Dict:
    """fp32 master copies of the trainable leaves (frozen bulk stays bf16).

    The AMP equivalent of the reference's fp32 master weights: at lr=1e-5 a
    single AdamW update is below bf16 weight resolution, so bf16 trainable
    weights would never move. Compute still runs in the module dtype."""
    flat = dict(traverse_util.flatten_dict(params))
    for p, on in traverse_util.flatten_dict(mask).items():
        if on and flat[p].dtype == jnp.bfloat16:
            flat[p] = flat[p].astype(jnp.float32)
    return traverse_util.unflatten_dict(flat)


def make_full_optimizer(cfg: TrainConfig, mask, accumulation_steps: int = 1):
    """clip+AdamW over the trainable subset (init with
    ``trainable_subset(params, mask)``). Frozen leaves never see the
    optimizer — no moments, no accumulator slots, no decay."""
    del mask  # selection happens via trainable_subset
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
    opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adam)
    if accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulation_steps)
    return opt


def embedding_row_mask(vocab_size: int, modifier_ids) -> jnp.ndarray:
    """[V, 1] mask: 1.0 only on modifier rows (reference grad zeroing,
    diffusers_training_xl_new.py:1044-1059)."""
    m = np.zeros((vocab_size, 1), np.float32)
    for i in modifier_ids:
        m[int(i)] = 1.0
    return jnp.asarray(m)


def make_full_train_step(
    unet_model,
    te1_model,
    te2_model,
    cfg: TrainConfig,
    acp: jnp.ndarray,
    optimizer,
    row_mask_1: Optional[jnp.ndarray],
    row_mask_2: Optional[jnp.ndarray],
    time_ids: jnp.ndarray,
    mask=None,
):
    """batch: latents [B,h,w,4] (pre-encoded+scaled), mask [B,h,w,1],
    ids_one/ids_two [B,77], is_prior [B].

    ``mask``: the full_trainable_mask tree — grads are taken only w.r.t.
    its leaves and ``state.opt_state`` covers only them."""

    def loss_fn(params, batch, rng):
        pen1 = te1_model.apply({"params": params["te1"]}, batch["ids_one"])[0]
        pen2, _, pooled, _ = te2_model.apply({"params": params["te2"]}, batch["ids_two"])
        ctx = jnp.concatenate([pen1, pen2], axis=-1)

        latents = batch["latents"]
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, cfg.num_train_timesteps)
        noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
        at = acp[t].astype(jnp.float32)[:, None, None, None]
        noisy = jnp.sqrt(at) * latents + jnp.sqrt(1.0 - at) * noise

        pred = unet_model.apply(
            {"params": params["unet"]}, noisy, t, ctx, pooled,
            jnp.tile(time_ids, (b, 1)),
        )
        se = (pred - noise) ** 2
        mask = batch["mask"]
        axes = (1, 2, 3)
        masked_mse = jnp.sum(se * mask, axis=axes) / jnp.maximum(jnp.sum(mask, axis=axes), 1.0)
        plain_mse = jnp.mean(se, axis=axes)
        is_prior = batch["is_prior"]
        if cfg.with_prior_preservation:
            inst_w = 1.0 - is_prior
            inst = jnp.sum(masked_mse * inst_w) / jnp.maximum(jnp.sum(inst_w), 1.0)
            prior = jnp.sum(plain_mse * is_prior) / jnp.maximum(jnp.sum(is_prior), 1.0)
            total = inst + cfg.prior_loss_weight * prior
            return total, {"loss": total, "instance_loss": inst, "prior_loss": prior}
        total = jnp.mean(masked_mse)
        return total, {"loss": total}

    assert mask is not None, "pass the full_trainable_mask tree"
    flat_mask = traverse_util.flatten_dict(mask)
    trainable_paths = tuple(sorted(p for p, on in flat_mask.items() if on))

    def train_step(state: FullTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        flat = traverse_util.flatten_dict(state.params)
        trainable = {p: flat[p] for p in trainable_paths}
        frozen = {p: v for p, v in flat.items() if p not in trainable}

        def loss_from_trainable(tr):
            params = traverse_util.unflatten_dict({**frozen, **tr})
            return loss_fn(params, batch, rng)

        (_, metrics), grads = jax.value_and_grad(
            loss_from_trainable, has_aux=True
        )(trainable)
        # zero non-modifier embedding-row grads (dtype-preserving: an fp32
        # mask would promote bf16 grads and drift the opt-state dtype,
        # recompiling every step)
        for key, row_mask in (("te1", row_mask_1), ("te2", row_mask_2)):
            p = (key, "token_embedding", "embedding")
            if row_mask is not None and p in grads:
                grads[p] = (grads[p] * row_mask).astype(grads[p].dtype)
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        params = traverse_util.unflatten_dict({**frozen, **trainable})
        return FullTrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step


# ---------------------------------------------------------------------------
# checkpoint writing


def extract_delta(
    unet_params,
    mask_tree,
    te1_params,
    te2_params,
    modifier_tokens,
    modifier_ids_1,
    modifier_ids_2,
) -> Tuple[Dict, Dict, Dict]:
    """Pull the trainable UNet leaves + modifier embedding rows into the
    delta-dict schema (save_checkpoint, diffusers_training_xl_new.py:41-66)."""
    flat_p = traverse_util.flatten_dict(unet_params)
    flat_m = traverse_util.flatten_dict(mask_tree)
    unet_delta = {p: np.asarray(flat_p[p]) for p, on in flat_m.items() if on}
    emb1 = np.asarray(traverse_util.flatten_dict(te1_params)[("token_embedding", "embedding")])
    emb2 = np.asarray(traverse_util.flatten_dict(te2_params)[("token_embedding", "embedding")])
    tok1 = {tok: emb1[int(i)] for tok, i in zip(modifier_tokens, modifier_ids_1)}
    tok2 = {tok: emb2[int(i)] for tok, i in zip(modifier_tokens, modifier_ids_2)}
    return unet_delta, tok1, tok2


def save_delta_checkpoint(
    path: str,
    state: FullTrainState,
    mask_tree,
    modifier_tokens,
    modifier_ids_1,
    modifier_ids_2,
    save_text_encoder: bool = False,
):
    """``save_text_encoder`` adds the full text-tower state dicts (the
    reference's ``save_checkpoint(save_text_encoder=...)`` branch,
    diffusers_training_xl_new.py:52-53) — set with --train_text_encoder."""
    unet_delta, tok1, tok2 = extract_delta(
        state.params["unet"], mask_tree["unet"], state.params["te1"],
        state.params["te2"], modifier_tokens, modifier_ids_1, modifier_ids_2,
    )
    te_sd = te2_sd = None
    if save_text_encoder:
        from tweediemix_tpu.models.convert import clip_params_to_hf_state_dict

        te_sd = clip_params_to_hf_state_dict(state.params["te1"])
        te2_sd = clip_params_to_hf_state_dict(state.params["te2"])
    save_reference_delta(path, unet_delta, tok1, tok2,
                         text_encoder=te_sd, text_encoder_2=te2_sd)


def save_resume_checkpoint(ckpt_dir: str, state: FullTrainState,
                           step: int | None = None):
    """Full-state orbax checkpoint (trainer resume — absent in the reference).

    ``step`` names the checkpoint directory; pass the user-facing
    *optimizer* step (``state.step`` is the micro-step counter and diverges
    from it under gradient accumulation — ``--resume_step`` is specified in
    optimizer steps). Defaults to ``int(state.step)`` for accum=1 callers.
    The restored ``state.step`` comes from the checkpoint contents, so the
    name is purely a lookup key."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    name_step = int(state.step) if step is None else int(step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, f"state_{name_step}"), state, force=True)


def load_resume_checkpoint(ckpt_dir: str, step: int, template: FullTrainState) -> FullTrainState:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(ckpt_dir, f"state_{step}"), template)
