#!/usr/bin/env bash
# Image-to-video on a generated multi-concept image — run_video.py parity.
set -e
python -m tweediemix_tpu.cli.run_video \
  --image "${IMAGE:-./test_out/photo of a cat and a dog running, mountain background_3821.png}" \
  --prompt "a cat and a dog running, mountain background" \
  --output ./test_out/video.gif \
  --num_frames 16 --height 512 --width 512 --fps 8 \
  --n_timesteps 50 --guidance_scale 9.0 \
  --injection_timestep 0.02 --interp_ratio 0.7
