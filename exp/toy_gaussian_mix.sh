#!/usr/bin/env bash
# 1-D Gaussian mixture toy with witness-function visualization frames
# (the reference's visual smoke test, SURVEY.md §3.5).
python main.py \
  --is_train true --dataset gaussian_mix --architecture mlp \
  --model mmd --kernel gaussian --rbf_sigmas 0.1 0.25 0.5 1.0 \
  --batch_size 256 --z_dim 8 --dof_dim 8 \
  --learning_rate 3e-3 --dsteps 3 --start_dsteps 3 \
  --max_iteration 3000 --MMD_lr_scheduler false \
  --log_every 200 --sample_every 500 \
  "$@"
