#!/usr/bin/env bash
# MMD-GAN with witness gradient penalty (Demystifying MMD GANs config).
python main.py \
  --is_train true --dataset cifar10 --architecture dcgan \
  --model mmd --kernel rq \
  --batch_size 64 --output_size 32 --dof_dim 16 \
  --gradient_penalty 1.0 \
  --learning_rate 1e-4 --dsteps 5 \
  --max_iteration 150000 --MMD_lr_scheduler true \
  --compute_scores true --score_every 2000 \
  --steps_per_dispatch 4 \
  "$@"
