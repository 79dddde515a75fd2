#!/usr/bin/env python
"""Run the BASELINE staged configs as one chained pipeline.

Reference recipe (SURVEY.md §7 / BASELINE.json): each stage warm-starts
from the previous stage's weights (`train.init_from`), widening from bare
RGB to the full panoptic objective:

  1. kitti360_rgb_coarse          geometry+rgb, coarse only
  2. kitti360_hierarchical_depth  + fine pass + sparse-depth loss
  3. kitti360_semantic            + dual semantic fields + pseudo-filter
  4. kitti360_panoptic            full joint panoptic (flagship)

Usage (real data):
  python tools/run_staged.py --root datasets/KITTI-360 [--steps 2000] [KEY VALUE ...]
Usage (hardware smoke on the generated mini tree):
  python tools/run_staged.py --synthesize-tree /tmp/minikitti --steps 50

Per-stage eval metrics are printed and returned; every stage keeps its own
out/trained_model/<task>/<exp> checkpoints so any stage can be re-run or
evaluated independently.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = [
    "kitti360_rgb_coarse",
    "kitti360_hierarchical_depth",
    "kitti360_semantic",
    "kitti360_panoptic",
]

# -360 continuation: warm-start the full panoptic model into the joint
# perspective+fisheye objective (BASELINE config 5 / [pn360] branch).
STAGE_360 = "kitti360_360"


def tree_presets(tree_dir, n_frames=8, hw=(48, 64), n_boxes=6, n_concave=0):
    """KEY VALUE presets for a synthesized demo tree of the given scale.
    Pure (no IO) so tests can assert the derivation: the padded primitive
    capacity covers the boxes + ground plane rounded up to a multiple of 8
    (floor 16), and denser box soups get a deeper interval budget. Each
    concave L-building decomposes into 2 convex records (annotation3d)."""
    n_prims = n_boxes + 1 + 2 * n_concave  # + ground plane
    n_eff = n_boxes + 2 * n_concave
    return ["data.root", tree_dir,
            "data.frame_start", "0",
            "data.frame_num", str(n_frames),
            "data.test_every", "4",
            "data.max_primitives", str(max(16, -(-n_prims // 8) * 8)),
            "data.max_intervals", str(8 if n_eff <= 12 else 12),
            "data.ratio", "1.0",
            "render.far", "40.0"]


def stage_cfg(name, prev_ckpt, steps, common, user_keys, proposal=None):
    """Derive one stage's config. Pure (no training) so tests can assert the
    precedence rules: presets < stage defaults < explicit user opts.

    Returns (cfg, notes) where notes are human-readable derivation notes.
    """
    from panopticnerf_tpu.config import load_config
    from panopticnerf_tpu.config.config import merge_from_list

    notes = []
    cfg = load_config(os.path.join(REPO, "configs", f"{name}.yaml"))
    if proposal:
        # Proposal-style small coarse across the whole chain. Stages with a
        # fine field just set the override; the coarse-ONLY stage trains its
        # single field at the proposal size (same param names/shapes as the
        # later stages' coarse trunk — models.nerf.coarse_field_cfg — so the
        # geometry warm start merges instead of hitting shape mismatches).
        import dataclasses

        from panopticnerf_tpu.models.nerf import coarse_field_cfg

        d, w = proposal
        if cfg.render.n_importance > 0:
            cfg.model.coarse_trunk_depth = d
            cfg.model.coarse_trunk_width = w
            notes.append(f"proposal coarse {d}x{w}")
        else:
            eff = coarse_field_cfg(
                dataclasses.replace(cfg.model, coarse_trunk_depth=d,
                                    coarse_trunk_width=w), has_fine=True)
            cfg.model.trunk_depth = eff.trunk_depth
            cfg.model.trunk_width = eff.trunk_width
            cfg.model.skips = eff.skips
            cfg.model.color_width = eff.color_width
            notes.append(f"coarse-only stage trains the proposal field {d}x{w}")
    # Stage defaults (fresh run, warm-chained) go BEFORE the merge so
    # explicit user opts (train.resume / train.init_from / pretrain) win.
    cfg.train.resume = False
    if prev_ckpt and "train.init_from" not in user_keys:
        cfg.train.init_from = prev_ckpt
        # The chain IS the geometry pretrain: warm-started stages run
        # joint from step 0. Leaving the in-run `pretrain nerf` gate on
        # would zero the semantic losses for pretrain_steps (20k) — with
        # a shortened --steps that silently trains no semantics.
        if cfg.train.pretrain and "train.pretrain" not in user_keys:
            cfg.train.pretrain = ""
            notes.append("warm-chained: in-run pretrain gate dropped")
    merge_from_list(cfg, common)
    if steps:
        cfg.train.max_steps = steps
        cfg.train.epochs = max(1, steps // cfg.train.ep_iter)
        if (cfg.train.pretrain and cfg.train.pretrain_steps >= steps
                and "train.pretrain_steps" not in user_keys
                and "pretrain_steps" not in user_keys):
            # un-chained short run: split geometry/joint halves
            cfg.train.pretrain_steps = steps // 2
            notes.append(f"pretrain_steps scaled to {cfg.train.pretrain_steps} "
                         f"to fit --steps {steps}")
    return cfg, notes


def main() -> int:
    p = argparse.ArgumentParser(description="staged PanopticNeRF pipeline")
    p.add_argument("--root", default=None, help="KITTI-360 tree (data.root)")
    p.add_argument("--synthesize-tree", default=None, metavar="DIR",
                   help="generate the miniature fake-KITTI tree there and use it "
                        "(hardware smoke without the real dataset)")
    p.add_argument("--steps", type=int, default=0,
                   help="override train.max_steps for every stage (0 = config)")
    p.add_argument("--stages", type=int, default=0,
                   help="run only the first N stages (0 = all)")
    p.add_argument("--fisheye", action="store_true",
                   help="append the -360 stage (kitti360_360: joint "
                        "perspective+fisheye batches) after the panoptic "
                        "stage; with --synthesize-tree the tree also gets "
                        "MEI image_02 streams")
    p.add_argument("--tree-frames", type=int, default=8,
                   help="frames in the synthesized tree (with --synthesize-tree)")
    p.add_argument("--tree-hw", default="48,64", metavar="H,W",
                   help="image size of the synthesized tree (e.g. 94,352 for "
                        "quarter-res KITTI-360 scale)")
    p.add_argument("--tree-boxes", type=int, default=6,
                   help="bounding primitives in the synthesized tree; more "
                        "boxes = denser occlusion stress")
    p.add_argument("--tree-concave", type=int, default=0,
                   help="concave L-shaped extruded-polygon buildings in the "
                        "synthesized tree (each decomposes into 2 convex "
                        "records — exercises the annotation3d path)")
    p.add_argument("--proposal", default=None, metavar="D,W",
                   help="proposal-style small coarse for the whole chain "
                        "(model.coarse_trunk_depth/width=D,W; the coarse-only "
                        "first stage trains its single field at D,W so the "
                        "geometry warm start stays shape-compatible)")
    # parse_known_args: KEY VALUE overrides may be interleaved with flags.
    args, opts = p.parse_known_args()
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts

    from panopticnerf_tpu import engine

    # Presets first, user opts LAST — merge_from_list is last-wins, so a
    # user override always beats the synthesize-tree defaults.
    presets = []
    if args.synthesize_tree:
        from panopticnerf_tpu.data.demo_tree import write_demo_tree

        os.makedirs(args.synthesize_tree, exist_ok=True)
        hw = tuple(int(x) for x in args.tree_hw.split(","))
        write_demo_tree(args.synthesize_tree, n_frames=args.tree_frames,
                        hw=hw, n_boxes=args.tree_boxes, fisheye=args.fisheye,
                        n_concave=args.tree_concave)
        # Presets track the tree-scale flags (default: 8 frames at 0..7,
        # 48x64, 6 boxes, content within ~20 m). The geometrically
        # consistent tree is the quality proxy for the real dataset — the
        # handcrafted loader fixture (tests/test_kitti360.py) deliberately
        # mislabels vs its primitives and caps mIoU near 0.5.
        presets = tree_presets(args.synthesize_tree, args.tree_frames, hw,
                               args.tree_boxes, args.tree_concave)
    elif args.root:
        presets = ["data.root", args.root]
    common = presets + list(args.opts)
    user_keys = set(args.opts[::2])

    stages = list(STAGES) + ([STAGE_360] if args.fisheye else [])
    if args.stages:
        stages = stages[: args.stages]
    prev_ckpt = ""
    results = {}
    proposal = (tuple(int(x) for x in args.proposal.split(","))
                if args.proposal else None)
    for name in stages:
        cfg, notes = stage_cfg(name, prev_ckpt, args.steps, common, user_keys,
                               proposal=proposal)
        print(f"=== stage {name} "
              f"({'warm from ' + prev_ckpt if prev_ckpt else 'from scratch'}) ===",
              flush=True)
        for n in notes:
            print(f"  ({n})", flush=True)
        engine.run_train(cfg, max_steps=args.steps or None)
        res = engine.run_evaluate(cfg)
        results[name] = {k: v for k, v in res.items()
                         if isinstance(v, (int, float))}
        prev_ckpt = cfg.trained_model_dir
    print("=== staged pipeline summary ===")
    for name, res in results.items():
        print(f"  {name}: " + ", ".join(f"{k}={v:.3f}" for k, v in res.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
