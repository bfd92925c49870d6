#!/usr/bin/env bash
# SN-SMMDGAN on ImageNet 64x64, data-parallel over all local chips with
# the global-batch MMD estimator (BASELINE.json config #5).
NCHIPS=${NCHIPS:-8}
python main.py \
  --is_train true --dataset imagenet64 --architecture resnet \
  --model sn-smmd --kernel rq \
  --batch_size $((64 * NCHIPS)) --real_batch_size $((64 * NCHIPS)) \
  --output_size 64 --dof_dim 16 \
  --num_data_shards "$NCHIPS" --use_ring_mmd true \
  --learning_rate 1e-4 --dsteps 5 --scaling_coeff 10.0 \
  --max_iteration 150000 --MMD_lr_scheduler true \
  --compute_scores true --score_every 5000 \
  --compute_dtype bfloat16 --scaling_grad_estimator hutchinson \
  --steps_per_dispatch 4 \
  --ema_decay 0.9999 \
  `# measured FID-stability win at matched steps (BASELINE.md r5 EMA` \
  `# row); --ema_decay 0 serves live weights` \
  "$@"
