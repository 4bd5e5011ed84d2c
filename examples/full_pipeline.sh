#!/usr/bin/env bash
# The complete TweedieMix product flow on the TPU stack: per-concept
# training -> multi-concept fusion sampling (segmentation in the loop) ->
# image-to-video with first-frame injection. Mirrors the reference's
# singleconcept_train.sh + sample_catdog.sh + run_video.py sequence.
#
# Smoke mode (no weights, tiny models, finishes in minutes on one chip):
#   SMOKE=1 bash examples/full_pipeline.sh
set -e

MODEL_DIR=${MODEL_DIR:-./stable-diffusion-xl-base-1.0}
I2V_DIR=${I2V_DIR:-./i2vgen-xl}
OUT=${OUT:-./test_out}
SEED=${SEED:-3821}

PROMPT="photo of a cat running, mountain background+photo of a dog running, mountain background+mountain background"
PROMPT_ORIG="photo of a cat and a dog running, mountain background"
CONCEPTS="cat+dog+mountain"
MODIFIER="<cat1>+<dog1>+<mountain1>"
SEG_CONCEPTS="a cat+a dog"

if [ -n "$SMOKE" ]; then
  SAMPLE_FLAGS="--model_preset tiny --seg_preset heuristic --n_timesteps 6 --resampling_steps 1 --jumping_steps 1"
  VIDEO_FLAGS="--model_preset tiny --num_frames 4 --height 64 --width 64 --n_timesteps 4"
else
  SAMPLE_FLAGS="--model_dir $MODEL_DIR --seg_preset sam \
    --sam_checkpoint ${SAM_CHECKPOINT:-./sam_vit_h_4b8939.pth} \
    --detector_dir ${DETECTOR_DIR:-./owlvit-base-patch32} \
    --personal_checkpoint ./checkpoint_custom/cat1.bin+./checkpoint_custom/dog1.bin+./checkpoint_custom/mountain1.bin \
    --guidance_scale 0.8 --n_timesteps 50"
  VIDEO_FLAGS="--model_dir $I2V_DIR --num_frames 16 --height 512 --width 512 --n_timesteps 50"
fi

# stage 1+2: multi-concept fusion sample (train first via
# examples/singleconcept_train.sh if checkpoints are missing)
python -m tweediemix_tpu.cli.fusion_sampling $SAMPLE_FLAGS \
  --prompt "$PROMPT" --prompt_orig "$PROMPT_ORIG" \
  --concepts "$CONCEPTS" --modifier_token "$MODIFIER" \
  --seg_concepts "$SEG_CONCEPTS" \
  --t_cond 0.2 --seed "$SEED" --negative_prompt '' \
  --output_path "$OUT"

# stage 3: animate the sampled image (run_video.py:21-40 equivalents);
# --num_seeds batches several clips through one compiled trajectory
python -m tweediemix_tpu.cli.run_video $VIDEO_FLAGS \
  --image "$OUT/${PROMPT_ORIG}_${SEED}.png" \
  --prompt "$PROMPT_ORIG" \
  --num_seeds "${NUM_SEEDS:-1}" \
  --output "$OUT/video_${SEED}.gif"

# stage 4 (optional): CLIP-T alignment score of the sample — the paper's
# eval protocol. Real scoring needs an HF CLIPModel dir via CLIP_DIR;
# smoke mode runs random tiny towers just to exercise the stage.
if [ -n "$SMOKE" ]; then
  EVAL_FLAGS="--model_preset tiny"
else
  EVAL_FLAGS="--clip_dir ${CLIP_DIR:-./clip-vit-large-patch14}"
fi
python -m tweediemix_tpu.cli.evaluate $EVAL_FLAGS \
  --images "$OUT" --prompt "$PROMPT_ORIG" \
  --modifier_token "$MODIFIER" \
  --output "$OUT/eval.json" || echo "eval stage skipped (no CLIP weights)"

echo "full pipeline done: $OUT"
