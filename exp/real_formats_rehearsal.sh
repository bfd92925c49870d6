#!/usr/bin/env bash
# Real-format dress rehearsal: short trainings from EVERY real
# storage-format loader at production volume (SURVEY.md component #9
# under load; measured rows in BASELINE.md).
#
# Assets (no network here, so they are synthesized byte-format-exact):
#   python tools/make_assets.py --out "$ASSETS"
# then run this script.  One TPU-claiming process at a time — the runs
# are sequential.
set -u
ASSETS=${ASSETS:-/tmp/smmdax_assets}
LOGS=${LOGS:-/tmp/rehearsal}
mkdir -p "$LOGS"
common="--is_train true --compute_scores false --checkpoint_every 0 \
        --log_every 50 --random_seed 7"

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$LOGS/summary.log"
  timeout 1200 python main.py $common --checkpoint_dir "$(mktemp -d)" \
    --sample_dir "$(mktemp -d)" --log_dir "$(mktemp -d)" "$@" \
    > "$LOGS/$name.log" 2>&1
  echo "rc=$? $(grep -o 'images_per_sec=[0-9.]*' "$LOGS/$name.log" \
    | tail -3 | tr '\n' ' ')" | tee -a "$LOGS/summary.log"
}

flag32="--model sn-smmd --kernel rq --architecture resnet --output_size 32 \
        --batch_size 64 --real_batch_size 64 --dof_dim 16 --dsteps 5 \
        --compute_dtype bfloat16 --scaling_grad_estimator hutchinson"

# CIFAR-10 pickles (50k): device-resident flagship + host-fed ingest
run cifar_device   --dataset cifar10 --data_dir "$ASSETS" $flag32 \
  --steps_per_dispatch 4 --data_placement device --max_iteration 600
run cifar_host     --dataset cifar10 --data_dir "$ASSETS" $flag32 \
  --steps_per_dispatch 4 --max_iteration 400

# CelebA JPEG dir at 160px, host-fed deep resnet (JPEG-decode ingest)
run celeba160_host --dataset celeba --data_dir "$ASSETS" --model sn-smmd \
  --kernel rq --architecture resnet --output_size 160 --batch_size 64 \
  --real_batch_size 64 --dof_dim 16 --dsteps 5 --compute_dtype bfloat16 \
  --scaling_grad_estimator hutchinson --max_iteration 60

# LSUN LMDB through the from-scratch B+tree reader + threaded decode
run lsun_lmdb_host --dataset lsun --lsun_category bedroom_train \
  --data_dir "$ASSETS" --model mmd --kernel rq --architecture dcgan \
  --output_size 64 --batch_size 64 --real_batch_size 64 --dof_dim 16 \
  --dsteps 5 --compute_dtype bfloat16 --max_iteration 150

# pack LSUN to the decode-once uint8 cache, train device-resident
timeout 1200 python -m smmdax.data.convert lsun \
  "$ASSETS/lsun/bedroom_train_lmdb" \
  "$ASSETS/lsun/packed_bedroom_train_64.npy" --size 64 --threads 4 \
  > "$LOGS/pack.log" 2>&1
echo "pack rc=$?" | tee -a "$LOGS/summary.log"
run lsun_packed_device --dataset lsun --lsun_category bedroom_train \
  --data_dir "$ASSETS" --model sn-smmd --kernel rq --architecture resnet \
  --output_size 64 --batch_size 64 --real_batch_size 64 --dof_dim 16 \
  --dsteps 5 --compute_dtype bfloat16 --scaling_grad_estimator hutchinson \
  --steps_per_dispatch 4 --data_placement device --max_iteration 300

# ImageNet64 npz shards (50k): device-resident resnet-64
run imagenet64_device --dataset imagenet64 --data_dir "$ASSETS" \
  --model sn-smmd --kernel rq --architecture resnet --output_size 64 \
  --batch_size 64 --real_batch_size 64 --dof_dim 16 --dsteps 5 \
  --compute_dtype bfloat16 --scaling_grad_estimator hutchinson \
  --steps_per_dispatch 4 --data_placement device --max_iteration 300

# MNIST idx (28px, 1 channel), host-fed dcgan
run mnist_host --dataset mnist --data_dir "$ASSETS" --model mmd \
  --kernel rq --architecture dcgan --output_size 28 --c_dim 1 \
  --batch_size 64 --real_batch_size 64 --dof_dim 16 --dsteps 5 \
  --compute_dtype bfloat16 --max_iteration 150

echo DONE | tee -a "$LOGS/summary.log"
