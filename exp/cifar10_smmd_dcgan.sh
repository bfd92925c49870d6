#!/usr/bin/env bash
# SMMDGAN on CIFAR-10, DCGAN critic (paper config; arXiv:1805.11565).
# Reference-equivalent launch (SURVEY.md component #13).
python main.py \
  --is_train true --dataset cifar10 --architecture dcgan \
  --model smmd --kernel rq \
  --batch_size 64 --real_batch_size 64 --output_size 32 \
  --z_dim 128 --gf_dim 64 --df_dim 64 --dof_dim 16 \
  --learning_rate 1e-4 --beta1 0.5 --beta2 0.9 \
  --dsteps 5 --start_dsteps 10 --warmup_iterations 500 \
  --with_scaling true --scaling_coeff 10.0 \
  --max_iteration 150000 --MMD_lr_scheduler true --decay_rate 0.8 \
  --compute_scores true --score_every 2000 \
  --steps_per_dispatch 4 \
  "$@"
