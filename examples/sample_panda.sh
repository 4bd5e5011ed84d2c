#!/usr/bin/env bash
# 3-concept panda + teddybear + waterfall sample (the reference's
# sample_panda.sh recipe, LoRA-checkpoint variant with the t_stop window).
set -e
MODEL_DIR=${MODEL_DIR:-./stable-diffusion-xl-base-1.0}
RESULT_PATH=${RESULT_PATH:-./test_out_panda}
SAM_CHECKPOINT=${SAM_CHECKPOINT:-./sam_vit_h_4b8939.pth}
DETECTOR_DIR=${DETECTOR_DIR:-./owlvit-base-patch32}
SEED=${SEED:-3856}
PROMPT="photo of a panda playing with a ball, waterfall background+photo of a teddybear playing with a ball, waterfall background+waterfall background"
PROMPT_ORIG="photo of a panda and a teddybear playing with a ball, waterfall background"
CONCEPTS="panda+teddybear+waterfall"
MODIFIER="<panda1>+<teddybear1>+<waterfall1>"
SEG_CONCEPTS="a panda+a teddybear"
PERSONAL_CHECKPOINT="./checkpoint_custom/panda1_lora/delta-1000.bin+./checkpoint_custom/teddybear1_lora/delta-1000.bin+./checkpoint_custom/waterfall1_lora/delta-1000.bin"

python -m tweediemix_tpu.cli.fusion_sampling \
  --mode lora --t_stop 0.8 \
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
