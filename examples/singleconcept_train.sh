#!/usr/bin/env bash
# Single-concept personalization — the singleconcept_train.sh workflow of
# the reference on the TPU-native trainer (DP across all local devices
# replaces `accelerate launch`).
set -e

MODEL_DIR=${MODEL_DIR:-./stable-diffusion-xl-base-1.0}
INSTANCE_DIR=${INSTANCE_DIR:-./data/cat}
CLASS_DIR=${CLASS_DIR:-./real_reg/samples_cat}
OUTPUT_DIR=${OUTPUT_DIR:-./checkpoint_custom/cat}

# Custom-Diffusion K/V finetune (reference: 201 steps women/cat recipes)
python -m tweediemix_tpu.cli.train \
  --model_dir "$MODEL_DIR" \
  --instance_data_dir "$INSTANCE_DIR" \
  --class_data_dir "$CLASS_DIR" \
  --instance_prompt "photo of a <cat1> cat" \
  --class_prompt "cat" \
  --with_prior_preservation --real_prior --prior_loss_weight 1.0 \
  --num_class_images 200 \
  --resolution 512 --train_batch_size 1 --gradient_accumulation_steps 4 \
  --learning_rate 1e-5 --scale_lr --hflip \
  --use_8bit_adam \
  --max_train_steps 251 --save_steps 250 \
  --modifier_token "<cat1>" \
  --freeze_model crossattn_kv \
  --output_dir "$OUTPUT_DIR"

# LoRA variant (reference: 1001 steps, rank 4):
# python -m tweediemix_tpu.cli.train --freeze_model lora --lora_rank 4 \
#   --max_train_steps 1001 --save_steps 1000 ... (same flags)
