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
  --remat false \
  `# measured on v5e-16GB: B=64/160px fits WITHOUT remat and runs` \
  `# ~30% faster (276.6 vs 358.5 ms/macro-step); set remat=true only` \
  `# if a bigger batch / witness-GP config OOMs` \
  --steps_per_dispatch 4 \
  --ema_decay 0.9999 \
  `# measured FID-stability win at matched steps (BASELINE.md r5 EMA` \
  `# row); --ema_decay 0 serves live weights` \
  "$@"
