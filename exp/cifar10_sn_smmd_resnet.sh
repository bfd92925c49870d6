#!/usr/bin/env bash
# SN-SMMDGAN on CIFAR-10, ResNet G/D (the paper's best CIFAR model).
python main.py \
  --is_train true --dataset cifar10 --architecture resnet \
  --model sn-smmd --kernel rq \
  --batch_size 64 --output_size 32 --dof_dim 16 \
  --learning_rate 1e-4 --beta1 0.5 --beta2 0.9 \
  --dsteps 5 --start_dsteps 10 \
  --scaling_coeff 10.0 \
  --max_iteration 150000 --MMD_lr_scheduler true --decay_rate 0.8 \
  --compute_scores true --score_every 2000 \
  --compute_dtype bfloat16 --scaling_grad_estimator hutchinson \
  --steps_per_dispatch 4 \
  --ema_decay 0.9999 \
  `# paired 150k-step measurement (BASELINE.md r5 EMA row): the EMA` \
  `# shadow wins FID at 40/53 scoring events once warmed (median 0.56` \
  `# vs 0.87) at zero best-point cost; pass --ema_decay 0 to serve` \
  `# live weights` \
  "$@"
