#!/usr/bin/env bash
# WGAN-GP baseline (the reference's comparison model).
python main.py \
  --is_train true --dataset cifar10 --architecture dcgan \
  --model wgan-gp --kernel rq --dof_dim 1 \
  --batch_size 64 --output_size 32 \
  --gradient_penalty 10.0 --gp_variant two_sided \
  --learning_rate 1e-4 --dsteps 5 \
  --max_iteration 150000 \
  --compute_scores true --score_every 2000 \
  --steps_per_dispatch 4 \
  "$@"
