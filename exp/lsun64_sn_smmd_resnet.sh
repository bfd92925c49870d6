#!/usr/bin/env bash
# SN-SMMDGAN on LSUN bedrooms 64x64 (the MMD-GAN lineage's LSUN config).
# Expects an official LSUN LMDB environment under data/lsun/ (e.g.
# data/lsun/bedroom_train_lmdb/data.mdb) — read natively by
# smmdax.data.lmdb_store, no lmdb package needed.
python main.py \
  --is_train true --dataset lsun --architecture resnet \
  --model sn-smmd --kernel rq \
  --batch_size 64 --output_size 64 --dof_dim 16 \
  --learning_rate 1e-4 --dsteps 5 --scaling_coeff 10.0 \
  --max_iteration 150000 --MMD_lr_scheduler true \
  --compute_scores true --score_every 5000 \
  --compute_dtype bfloat16 --scaling_grad_estimator hutchinson \
  --steps_per_dispatch 4 \
  "$@"
