#!/usr/bin/env bash
# SN-SMMDGAN on CelebA 160x160, deep ResNet (paper's best CelebA model).
python main.py \
  --is_train true --dataset celeba --architecture resnet \
  --model sn-smmd --kernel rq \
  --batch_size 64 --output_size 160 --dof_dim 16 \
  --gf_dim 32 --df_dim 32 \
  --learning_rate 1e-4 --dsteps 5 --scaling_coeff 10.0 \
  --max_iteration 150000 --MMD_lr_scheduler true \
  --compute_scores true --score_every 5000 \
  --compute_dtype bfloat16 --scaling_grad_estimator hutchinson \
  --remat true \
  --steps_per_dispatch 4 \
  "$@"
