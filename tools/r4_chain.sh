#!/bin/bash
# Round-4 hardware evidence chain (VERDICT round-3 items 3 + 4):
#   1. full-res concave tree + stages rgb->depth->semantic (full coarse)
#   2. panoptic 10k control (full coarse; reproduces the round-3 PQ decay)
#   3. panoptic 10k with loss.agree_filter (the decay fix under ablation)
#   4. PQ fusion sweep + instance error maps on the control checkpoint
# Serial: the axon relay serializes TPU claims (CLAUDE.md).
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
T=/tmp/fr_tree

echo "=== [1/4] tree + stages 1-3 ==="
timeout 5400 python tools/run_staged.py --synthesize-tree $T --steps 2000 --stages 3 \
  --tree-hw 376,1408 --tree-frames 8 --tree-boxes 16 --tree-concave 4 \
  model_dir out/fullres

PRE=(data.root "$T" data.frame_start 0 data.frame_num 8 data.test_every 4
     data.max_primitives 32 data.max_intervals 12 data.ratio 1.0 render.far 40.0)
COMMON=("${PRE[@]}" model.coarse_trunk_depth 0 model.coarse_trunk_width 0
  train.init_from out/fullres/panopticnerf/kitti360_semantic
  train.pretrain "" train.max_steps 10000 train.epochs 20 train.ep_iter 500
  train.eval_ep 4 train.eval_views 8 model_dir out/fullres)

echo "=== [2/4] panoptic 10k CONTROL (full coarse, agree_filter off) ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  "${COMMON[@]}" exp_name kitti360_panoptic_ctl

echo "=== [3/4] panoptic 10k loss.agree_filter ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  "${COMMON[@]}" loss.agree_filter True exp_name kitti360_panoptic_agree

echo "=== [4/4] PQ analysis on the control checkpoint ==="
timeout 2500 python tools/pq_analysis.py --cfg_file configs/kitti360_panoptic.yaml \
  --out out/pq_analysis "${PRE[@]}" model.coarse_trunk_depth 0 model.coarse_trunk_width 0 \
  model_dir out/fullres exp_name kitti360_panoptic_ctl
echo "=== chain done ==="
