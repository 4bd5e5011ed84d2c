#!/usr/bin/env bash
# Multi-concept fusion sampling — the sample_catdog.sh workflow of the
# reference, on the TPU-native stack. Expects a local SDXL checkpoint dir
# (HF layout: unet/ vae/ text_encoder/ text_encoder_2/ tokenizer/
# tokenizer_2/) and per-concept delta checkpoints from cli/train.py or the
# reference trainer (same .bin schema).
set -e

MODEL_DIR=${MODEL_DIR:-./stable-diffusion-xl-base-1.0}
RESULT_PATH=${RESULT_PATH:-./test_out}
SEED=${SEED:-3821}
# real-weights segmentation (lang_sam.py:20-24 equivalents, local files):
SAM_CHECKPOINT=${SAM_CHECKPOINT:-./sam_vit_h_4b8939.pth}
DETECTOR_DIR=${DETECTOR_DIR:-./owlvit-base-patch32}

# background must come last; concept order must match the prompts
PROMPT="photo of a cat running, mountain background+photo of a dog running, mountain background+mountain background"
PROMPT_ORIG="photo of a cat and a dog running, mountain background"
CONCEPTS="cat+dog+mountain"
MODIFIER="<cat1>+<dog1>+<mountain1>"
SEG_CONCEPTS="a cat+a dog"
PERSONAL_CHECKPOINT="./checkpoint_custom/cat1.bin+./checkpoint_custom/dog1.bin+./checkpoint_custom/mountain1.bin"

python -m tweediemix_tpu.cli.fusion_sampling \
  --mode cd \
  --model_dir "$MODEL_DIR" \
  --guidance_scale 0.8 --n_timesteps 50 \
  --prompt "$PROMPT" --prompt_orig "$PROMPT_ORIG" \
  --personal_checkpoint "$PERSONAL_CHECKPOINT" \
  --concepts "$CONCEPTS" --modifier_token "$MODIFIER" \
  --seg_concepts "$SEG_CONCEPTS" --seg_preset sam \
  --sam_checkpoint "$SAM_CHECKPOINT" --detector_dir "$DETECTOR_DIR" \
  --resolution_h 1024 --resolution_w 1024 \
  --t_cond 0.2 --seed "$SEED" --negative_prompt '' \
  --output_path "$RESULT_PATH" --output_path_all "$RESULT_PATH"

# LoRA-checkpoint variant (fusion window ends at t_stop):
# python -m tweediemix_tpu.cli.fusion_sampling --mode lora --t_stop 0.8 ... (same flags)
