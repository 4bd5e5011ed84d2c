"""End-to-end multi-concept fusion pipeline: prompts → embeddings → sampler
→ VAE decode.

Mirrors the reference's prompt contract (``fusion_generation/
fusion_sampling.py:139-196`` and ``sample_catdog.sh``):

* ``prompt``: ``+``-separated per-concept prompts, background LAST;
* ``prompt_orig``: the joint multi-concept prompt;
* ``concepts`` / ``modifier_token``: ``+``-separated, same order; each
  concept prompt gets its modifier token inserted immediately before the
  concept word (``fusion_sampling.py:151-154``);
* single-concept prompts for the resampling prologue are the RAW per-concept
  prompts of the foreground concepts (``:149``, without modifier tokens);
* per-concept checkpoints supply modifier-token embeddings for both text
  encoders and Custom-Diffusion K/V (or LoRA) deltas.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tweediemix_tpu.concepts.delta import (
    cd_delta_from_reference,
    lora_delta_from_reference,
    stack_cd_params,
    stack_lora_params,
)
from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler, TextEmbeds
from tweediemix_tpu.models.clip import DualTextEncoder
from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
from tweediemix_tpu.models.vae import (
    AutoencoderKL,
    postprocess_image,
    unscale_latents,
)
from tweediemix_tpu.schedulers.ddim import DDIMTable


def stack_text_embeds(embeds_list: Sequence[TextEmbeds]) -> TextEmbeds:
    """Stack S per-seed TextEmbeds into one multi-prompt TextEmbeds (each
    leaf gains a per-seed axis at position 1) so seed row s of a batched
    trajectory samples prompt set s — the BASELINE "batched multi-prompt
    pipeline" serving config. Pass with ``num_seeds == S``."""
    return TextEmbeds(*(jnp.stack(parts, axis=1) for parts in zip(*embeds_list)))


def insert_modifier(prompt: str, concept: str, modifier: str) -> str:
    """``"photo of a cat running"`` + cat/<cat1> → ``"photo of a <cat1> cat
    running"`` (fusion_sampling.py:151-154)."""
    idx = prompt.find(concept)
    if idx < 0:
        return f"{modifier} {prompt}"
    return prompt[:idx] + modifier + " " + prompt[idx:]


@dataclasses.dataclass
class TweedieMixPipeline:
    unet: UNet2DConditionModel
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text: DualTextEncoder
    tokenizer_1: object
    tokenizer_2: object
    fusion_config: FusionConfig
    table: DDIMTable
    segment_fn: Optional[object] = None
    _sampler: Optional[object] = None  # cached FusionSampler (compile reuse)

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_concept_checkpoints(
        cls,
        base_unet_params: dict,
        checkpoints: Sequence[dict],
        modifier_tokens: Sequence[str],
        unet_cfg: UNetConfig,
        vae,
        vae_params,
        text: DualTextEncoder,
        tokenizer_1,
        tokenizer_2,
        fusion_config: FusionConfig,
        mode: str = "cd",
        segment_fn=None,
    ) -> "TweedieMixPipeline":
        """Wire N loaded reference delta dicts (concepts/delta.py
        ``load_reference_delta``) into stacked UNet params and modifier
        token embeddings (fusion_sampling.py:156-210)."""
        n = len(checkpoints)
        # --train_text_encoder checkpoints carry whole text-tower state
        # dicts; the reference loads them with load_state_dict before the
        # modifier-token surgery (diffusers_model_pipeline_xl_new.py:
        # 327-328) — sequential loads mean the last one wins
        te_sts = [st for st in checkpoints if "text_encoder" in st]
        if te_sts:
            if len(te_sts) > 1:
                import warnings

                warnings.warn(
                    f"{len(te_sts)} concept checkpoints carry full "
                    f"text-encoder weights; applying the last (the "
                    f"reference's sequential load_state_dict behavior)")
            st_te = te_sts[-1]
            text.load_tower_state(st_te.get("text_encoder"),
                                  st_te.get("text_encoder_2"))
        # modifier tokens → both tokenizers + embedding rows
        ids1, ids2, rows1, rows2 = [], [], [], []
        for tok, st in zip(modifier_tokens, checkpoints):
            if not st.get("modifier_token"):
                continue
            tokenizer_1.add_tokens(tok)
            tokenizer_2.add_tokens(tok)
            ids1.append(tokenizer_1.convert_tokens_to_ids(tok))
            ids2.append(tokenizer_2.convert_tokens_to_ids(tok))
            # checkpoint stores {orig_token_name: embedding}; take the values
            rows1.append(next(iter(st["modifier_token"].values())))
            rows2.append(next(iter(st["modifier_token_2"].values())))
        if ids1:
            text.add_modifier_tokens(ids1, rows1, ids2, rows2)

        if mode == "cd":
            kvs = [cd_delta_from_reference(st) for st in checkpoints]
            params = stack_cd_params(base_unet_params, kvs)
            ucfg = dataclasses.replace(unet_cfg, concept_slots=n + 1)
        elif mode == "lora":
            loras = [lora_delta_from_reference(st) for st in checkpoints]
            params = stack_lora_params(base_unet_params, loras, rank=unet_cfg.lora_rank)
            ucfg = dataclasses.replace(unet_cfg, lora_slots=n + 1)
        else:
            raise ValueError(mode)

        table = DDIMTable.create(n_steps=fusion_config.n_timesteps)
        return cls(
            unet=UNet2DConditionModel(ucfg),
            unet_params=params,
            vae=vae,
            vae_params=vae_params,
            text=text,
            tokenizer_1=tokenizer_1,
            tokenizer_2=tokenizer_2,
            fusion_config=fusion_config,
            table=table,
            segment_fn=segment_fn,
        )

    # -- text ------------------------------------------------------------------

    def encode_prompts(self, prompts: List[str]):
        ids1 = jnp.asarray(self.tokenizer_1(prompts), jnp.int32)
        ids2 = jnp.asarray(self.tokenizer_2(prompts), jnp.int32)
        return self.text.encode_ids(ids1, ids2)

    def prepare_text_embeds(
        self,
        prompt: str,
        prompt_orig: str,
        concepts: str,
        modifier_token: str,
        negative_prompt: str = "",
    ) -> TextEmbeds:
        """+‑separated contract of the sample scripts (sample_catdog.sh:9-22)."""
        prompt_sep = prompt.split("+")
        concept_list = concepts.split("+")
        modifiers = modifier_token.split("+")
        n = len(concept_list)
        if len(prompt_sep) != n or len(modifiers) != n:
            raise ValueError(
                f"--prompt ({len(prompt_sep)} rows), --concepts ({n}) and "
                f"--modifier_token ({len(modifiers)}) must all have the same "
                "number of '+'-separated entries (background last)"
            )
        assert n == self.fusion_config.num_concepts, (n, self.fusion_config.num_concepts)

        multi = prompt_orig.split("+")[0]
        per_concept = [
            insert_modifier(prompt_sep[i], concept_list[i], modifiers[i]) for i in range(n)
        ]
        singles = prompt_sep[: n - 1]

        uncond_ctx, uncond_pooled = self.encode_prompts([negative_prompt])
        multi_ctx, multi_pooled = self.encode_prompts([multi])
        single_ctx, single_pooled = self.encode_prompts(singles)
        concept_ctx, concept_pooled = self.encode_prompts(per_concept)

        return TextEmbeds(
            joint_ctx=jnp.concatenate([uncond_ctx, multi_ctx], 0),
            joint_pooled=jnp.concatenate([uncond_pooled, multi_pooled], 0),
            single_ctx=single_ctx,
            single_pooled=single_pooled,
            concept_ctx=jnp.concatenate([uncond_ctx, concept_ctx], 0),
            concept_pooled=jnp.concatenate([uncond_pooled, concept_pooled], 0),
        )

    # -- sampling ----------------------------------------------------------------

    def _unet_fn(self):
        cfg = self.fusion_config
        time_ids = jnp.array(
            [[cfg.height, cfg.width, 0, 0, cfg.height, cfg.width]], jnp.float32
        )
        model = self.unet

        def unet_fn(params, x, t, ctx, pooled, idx, cross_kv=None):
            b = x.shape[0]
            return model.apply(
                {"params": params}, x, t, ctx, pooled, jnp.tile(time_ids, (b, 1)), idx,
                cross_kv=cross_kv,
            )

        return unet_fn

    def _kv_builder(self):
        from tweediemix_tpu.models.unet2d import precompute_cross_kv

        cfg = self.unet.config

        def kv_builder(params, ctx_rows, idx):
            return precompute_cross_kv(cfg, params, ctx_rows, idx)

        return kv_builder

    def decode_preview(self, x0):
        vcfg = self.vae.config
        z = unscale_latents(x0.astype(jnp.float32), vcfg, preview=True)
        img = self.vae.apply({"params": self.vae_params}, z, method=self.vae.decode)
        return postprocess_image(img)

    def decode_final(self, x):
        vcfg = self.vae.config
        z = unscale_latents(x.astype(jnp.float32), vcfg)
        img = self.vae.apply({"params": self.vae_params}, z, method=self.vae.decode)
        return postprocess_image(img)

    def sample(
        self,
        embeds: TextEmbeds,
        seed: int = 0,
        fg_masks=None,
        num_seeds: int = 1,
        mesh_devices: int = 1,
    ):
        """Run the fusion trajectory and decode. Returns [S,H,W,3] in [0,1].

        ``num_seeds`` > 1 batches independent seeds through every UNet
        forward (one compiled trajectory, S images). ``mesh_devices`` > 1
        shards every forward's batch rows over a 1-D dp mesh (the v5e-8
        "seeds in parallel" serving layout); row counts (2·S joint,
        (N+1)·S fused) must divide the device count."""
        if self._sampler is None or getattr(self, "_sampler_mesh", 1) != mesh_devices:
            unet_fn = self._unet_fn()
            kv_builder = self._kv_builder()
            params = self.unet_params
            if mesh_devices > 1:
                from tweediemix_tpu.parallel.mesh import (
                    make_mesh, replicate, seed_sharded_unet_fn)

                mesh = make_mesh({"dp": mesh_devices},
                                 devices=jax.devices()[:mesh_devices])
                # non-divisible row counts (e.g. the 2-row joint phase on 4
                # chips) are padded inside the wrapper
                unet_fn = seed_sharded_unet_fn(mesh, unet_fn)
                params = replicate(mesh, params)
                kv_builder = None  # sharded fn owns its row layout
            self._sampler = FusionSampler(
                self.table,
                self.fusion_config,
                unet_fn,
                unet_params=params,
                decode_preview_fn=self.decode_preview,
                segment_fn=self.segment_fn,
                kv_builder=kv_builder,
            )
            self._sampler_mesh = mesh_devices
        x = self._sampler.run(
            embeds, jax.random.PRNGKey(seed), fg_masks=fg_masks, num_seeds=num_seeds
        )
        imgs = [self.decode_final(x[s : s + 1]) for s in range(x.shape[0])]
        return jnp.concatenate(imgs, axis=0)


def save_image(img, path: str):
    """[1,H,W,3] float [0,1] → PNG."""
    from PIL import Image

    arr = np.asarray(img[0] * 255.0, dtype=np.uint8)
    Image.fromarray(arr).save(path)
