#!/bin/bash
# Round-5 second independent full-res defense of the 4x64 proposal coarse
# (BASELINE.md "Round-5 throughput contingency"): the recorded decision rule
# says changing the shipped default needs more than one run per shape. The
# first p64 defense (/tmp/p64_10k.log, out/fullres_p64 — container-reset
# casualty) landed PQ ABOVE both comparators; this reruns the identical
# protocol on an INDEPENDENT tree instance (the committed r5_sky_chain clean
# tree at /tmp/fr5_tree) so a default flip to 4x64 is two-run defended.
# Serial: the axon relay serializes TPU claims (CLAUDE.md).
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
T=/tmp/fr5_tree

PRE=(data.frame_start 0 data.frame_num 8 data.test_every 4
     data.max_primitives 32 data.max_intervals 12 data.ratio 1.0
     render.far 40.0)
ARM=(model.coarse_trunk_depth 4 model.coarse_trunk_width 64
     train.pretrain "" train.max_steps 10000 train.epochs 20
     train.ep_iter 500 train.eval_ep 4 train.eval_views 8)

echo "=== [1/2] stages 1-3 on the fr5 clean tree, proposal 4,64 ==="
timeout 5400 python tools/run_staged.py --root $T --steps 2000 --stages 3 \
  --proposal 4,64 "${PRE[@]}" model_dir out/fr5_p64

echo "=== [2/2] panoptic 10k p64 arm ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  data.root $T "${PRE[@]}" "${ARM[@]}" \
  train.init_from out/fr5_p64/panopticnerf/kitti360_semantic \
  model_dir out/fr5_p64 exp_name kitti360_panoptic_p64

echo "=== p64 second defense done ==="
