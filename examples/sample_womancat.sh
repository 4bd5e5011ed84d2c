#!/usr/bin/env bash
# woman + cat 3-concept sample (the reference's sample_womancat.sh recipe).
set -e
MODEL_DIR=${MODEL_DIR:-./stable-diffusion-xl-base-1.0}
RESULT_PATH=${RESULT_PATH:-./test_out_woman}
SAM_CHECKPOINT=${SAM_CHECKPOINT:-./sam_vit_h_4b8939.pth}
DETECTOR_DIR=${DETECTOR_DIR:-./owlvit-base-patch32}
SEED=${SEED:-3831}
PROMPT="photo of a woman sitting on the grass+photo of a cat sitting on the grass+grass background"
PROMPT_ORIG="photo of a woman and a cat sitting on the grass"
CONCEPTS="woman+cat+grass"
MODIFIER="<woman1>+<cat1>+<grass1>"
SEG_CONCEPTS="a woman+a cat"
PERSONAL_CHECKPOINT="./checkpoint_custom/woman1.bin+./checkpoint_custom/cat1.bin+./checkpoint_custom/grass1.bin"

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
