#!/bin/bash
# Graded empty-sky-filter arms (loss.empty_sky_weight — the train-time
# twin of eval.sky_rule soft:<w>). Reuses tools/r5_sky_chain.sh's trees
# and 2k semantic stages; two 10k panoptic arms (noisy + clean regime)
# with empty_sky_filter True empty_sky_weight 0.3, then keep-0 evals at
# reference fusion for comparability with the round-5 esf table.
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
T=/tmp/fr5_tree
TN=/tmp/fr5_tree_noisy
W=${ESFW:-0.3}

PRE=(data.frame_start 0 data.frame_num 8 data.test_every 4
     data.max_primitives 32 data.max_intervals 12 data.ratio 1.0
     render.far 40.0)
ARM=(model.coarse_trunk_depth 0 model.coarse_trunk_width 0
     train.pretrain "" train.max_steps 10000 train.epochs 20
     train.ep_iter 500 train.eval_ep 4 train.eval_views 8
     loss.empty_sky_filter True loss.empty_sky_weight "$W")

echo "=== [1/2] panoptic 10k esf+w$W NOISY ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  data.root $TN "${PRE[@]}" "${ARM[@]}" \
  train.init_from out/fr5_noisy/panopticnerf/kitti360_semantic \
  model_dir out/fr5_noisy exp_name kitti360_panoptic_esfw

echo "=== [2/2] panoptic 10k esf+w$W CLEAN ==="
timeout 5400 python train_net.py --cfg_file configs/kitti360_panoptic.yaml \
  data.root $T "${PRE[@]}" "${ARM[@]}" \
  train.init_from out/fr5_clean/panopticnerf/kitti360_semantic \
  model_dir out/fr5_clean exp_name kitti360_panoptic_esfw

echo "=== esfw arms done ==="
