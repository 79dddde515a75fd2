#!/bin/bash
# Round-4 config-5 hardware record (VERDICT round-3 item 5): train from the
# UNMODIFIED configs/kitti360_360.yaml — two data.sequences, stream_window,
# fisheye joint batches all from the shipped file. Only data.root (tree
# location) and run-length/cadence knobs are overridden.
set -e
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
T=/tmp/c5_tree

echo "=== synthesize 2-sequence fisheye tree (frame 3353..3416) ==="
timeout 2400 python - <<'EOF'
import os
from panopticnerf_tpu.data.demo_tree import write_demo_tree
root = "/tmp/c5_tree"
os.makedirs(root, exist_ok=True)
for seq, seed in (("2013_05_28_drive_0000_sync", 0),
                  ("2013_05_28_drive_0002_sync", 7)):
    write_demo_tree(root, n_frames=64, hw=(94, 352), n_boxes=12, seed=seed,
                    seq=seq, fisheye=True, n_concave=2, frame_start=3353)
    print("wrote", seq, flush=True)
EOF

echo "=== train_net.py on the unmodified config-5 YAML ==="
timeout 3000 python train_net.py --cfg_file configs/kitti360_360.yaml \
  data.root $T \
  train.max_steps 2000 train.epochs 4 train.pretrain_steps 1000 \
  train.eval_ep 2 train.eval_views 8 model_dir out/config5
echo "=== config-5 record done ==="
