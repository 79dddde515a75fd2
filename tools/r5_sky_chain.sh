#!/bin/bash
# Round-5 soft-sky-rule evidence chain (continuation of the round-5
# sky-rule measurement after a container reset wiped the checkpoints):
#   1. full-res concave tree + stages rgb->depth->semantic (2k each)
#   2. structured-noise clone (corrupt_pseudo 15%) + its own stages 1-3
#   3. panoptic 10k fixf arms on both regimes (shipped loss stack,
#      full coarse for comparability with the round-4/5 ablation matrices)
#   4. landing_sweep with the graded sky rule gridded next to the hard
#      rules: off | empty | support | soft:{0.25,0.5,0.75}
# Serial: the axon relay serializes TPU claims (CLAUDE.md).
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
T=/tmp/fr5_tree
TN=/tmp/fr5_tree_noisy

PRE=(data.frame_start 0 data.frame_num 8 data.test_every 4
     data.max_primitives 32 data.max_intervals 12 data.ratio 1.0
     render.far 40.0)
ARM=(model.coarse_trunk_depth 0 model.coarse_trunk_width 0
     train.pretrain "" train.max_steps 10000 train.epochs 20
     train.ep_iter 500 train.eval_ep 4 train.eval_views 8)
SKY="off,empty,support,soft:0.25,soft:0.5,soft:0.75"

echo "=== [1/6] clean tree + stages 1-3 ==="
timeout 5400 python tools/run_staged.py --synthesize-tree $T --steps 2000 --stages 3 \
  --tree-hw 376,1408 --tree-frames 8 --tree-boxes 16 --tree-concave 4 \
  model_dir out/fr5_clean

echo "=== [2/6] corrupt clone + noisy stages 1-3 ==="
timeout 1200 python tools/corrupt_pseudo.py --src $T --dst $TN --frac 0.15 --seed 0
timeout 5400 python tools/run_staged.py --root $TN --steps 2000 --stages 3 \
  "${PRE[@]}" model_dir out/fr5_noisy

echo "=== [3/6] panoptic 10k fixf NOISY ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  data.root $TN "${PRE[@]}" "${ARM[@]}" \
  train.init_from out/fr5_noisy/panopticnerf/kitti360_semantic \
  model_dir out/fr5_noisy exp_name kitti360_panoptic_fixf

echo "=== [4/6] panoptic 10k fixf CLEAN ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  data.root $T "${PRE[@]}" "${ARM[@]}" \
  train.init_from out/fr5_clean/panopticnerf/kitti360_semantic \
  model_dir out/fr5_clean exp_name kitti360_panoptic_fixf

echo "=== [5/6] sky-rule sweep NOISY ==="
timeout 3000 python tools/landing_sweep.py --cfg_file configs/kitti360_panoptic.yaml \
  --ckpts fixf=out/fr5_noisy/panopticnerf/kitti360_panoptic_fixf \
  --blends 0.5,0.75 --sky_rules "$SKY" --out out/ls_r5soft_noisy.json \
  data.root $TN "${PRE[@]}" model.coarse_trunk_depth 0 model.coarse_trunk_width 0

echo "=== [6/6] sky-rule sweep CLEAN ==="
timeout 3000 python tools/landing_sweep.py --cfg_file configs/kitti360_panoptic.yaml \
  --ckpts fixf_clean=out/fr5_clean/panopticnerf/kitti360_panoptic_fixf \
  --blends 0.5,0.75 --sky_rules "$SKY" --out out/ls_r5soft_clean.json \
  data.root $T "${PRE[@]}" model.coarse_trunk_depth 0 model.coarse_trunk_width 0

echo "=== chain done ==="
