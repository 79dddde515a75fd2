#!/usr/bin/env python
"""Cross-view fusion diagnostic: catch rate vs erosion, host-side only.

Round-5 (VERDICT round-4 item 1): the two xview hardware arms measured
NEUTRAL on the structured-noise tree. Before sweeping 10k-step TPU arms
blindly, measure what the vote actually does to the labels: load a clean
tree and its corrupted clone (tools/corrupt_pseudo.py), run
`cross_view_clean` over a (mode, window, tol, min_voters, repaint) grid,
and report per config:

  caught    — fraction of CORRUPTED pixels demoted/repainted-correctly
  erosion   — fraction of UNCORRUPTED labeled pixels lost (demoted or
              repainted wrongly)
  residual  — post-clean wrong-label rate among remaining labeled pixels
              (the quantity training actually sees)
  repaint_acc — of repainted pixels, fraction painted to the clean label

The clean tree's pspnet is itself GT + iid flips; "corrupted" means
noisy != clean pspnet (the blob repaints), so iid speckle counts as
uncorrupted ground state — exactly the supervision delta the TPU ablation
arms train on.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/xview_diag.py \
      --clean /tmp/kitti_tree --noisy /tmp/kitti_tree_noisy \
      [--grid "splat:2:0.1:2:0, pull:2:0.1:2:0, ..."]

Reference: [pn360] "improved filtering" (SURVEY.md §1) — this tool has no
reference analog; it exists to make the ship/no-ship decision measured.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

DEFAULT_GRID = ",".join([
    "pull:2:0.1:2:0",        # the round-4 shipped arm (window 2)
    "pull:7:0.1:2:0",        # the round-4 window-7 arm
    "splat:2:0.1:2:0",       # push-vote redesign, same knobs
    "splat:2:0.1:3:0",       # stricter quorum
    "splat:2:0.05:2:0",      # tighter depth tolerance
    "splat:2:0.2:2:0",       # looser depth tolerance
    "splat:7:0.1:2:0",       # wider window
    "splat:2:0.1:2:0.8",     # repaint at 80% concentration
    "splat:7:0.1:3:0.8",     # wide + quorum + repaint
])


def load_views(cfg_args):
    """Load a tree through the real loader with cross-view OFF; return the
    numpy pieces cross_view_clean consumes plus view_frames."""
    from panopticnerf_tpu.config import make_cfg
    from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset

    cfg = make_cfg(cfg_args)
    ds = build_kitti360_dataset(cfg)
    V = ds.pseudo.shape[0]
    n_frames = cfg.data.frame_num
    cams = V // n_frames
    view_frames = np.repeat(np.arange(n_frames), cams)
    persp = (np.asarray(ds.cam_model) == 0) if ds.cam_model is not None \
        else np.ones(V, bool)
    gt = (np.asarray(ds.gt_sem) if ds.gt_sem is not None
          else np.full(ds.pseudo.shape, 255, np.int32))
    return (np.asarray(ds.pseudo), gt, np.asarray(ds.depth), np.asarray(ds.K),
            np.asarray(ds.c2w), view_frames, persp)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clean", required=True)
    p.add_argument("--noisy", required=True)
    p.add_argument("--cfg_file", default="configs/kitti360_panoptic.yaml")
    p.add_argument("--grid", default=DEFAULT_GRID)
    p.add_argument("--out", default="out/xview_diag.json")
    args, opts = p.parse_known_args()

    from panopticnerf_tpu.data.pseudo import cross_view_clean, IGNORE

    class A:  # minimal make_cfg-compatible args
        def __init__(self, root):
            self.cfg_file = args.cfg_file
            self.opts = ["data.root", root, "data.frame_start", "0",
                         "data.frame_num", "8", "data.test_every", "4",
                         "data.max_primitives", "32", "data.max_intervals",
                         "12", "data.ratio", "1.0", "render.far", "40.0",
                         "data.pseudo_cross_view", "0"] + list(opts)

    t0 = time.time()
    lab_c, gt, *_ = load_views(A(args.clean))
    lab_n, _, depths, Ks, c2ws, view_frames, persp = load_views(A(args.noisy))
    print(f"loaded {lab_n.shape} views in {time.time()-t0:.1f}s", flush=True)

    labeled = (lab_n != IGNORE) & (lab_c != IGNORE)
    corrupted = labeled & (lab_n != lab_c)
    clean_px = labeled & (lab_n == lab_c)
    print(f"corruption rate among labeled: {corrupted.sum()/labeled.sum():.4f}",
          flush=True)

    rows = []
    for spec in args.grid.split(","):
        mode, window, tol, mv, rp = spec.strip().split(":")
        window, tol, mv, rp = int(window), float(tol), int(mv), float(rp)
        t0 = time.time()
        out = cross_view_clean(lab_n, depths, Ks, c2ws, view_frames, persp,
                               window=window, tol=tol, min_voters=mv,
                               mode=mode, repaint=rp)
        changed = out != lab_n
        # caught: corrupted pixel demoted OR repainted to the clean label
        fixed = corrupted & ((out == IGNORE) | (out == lab_c)) & changed
        caught = fixed.sum() / max(corrupted.sum(), 1)
        # erosion: clean labeled pixel demoted or repainted wrongly
        lost = clean_px & changed & (out != lab_c)
        erosion = lost.sum() / max(clean_px.sum(), 1)
        still = (out != IGNORE) & labeled
        residual = ((out != lab_c) & still).sum() / max(still.sum(), 1)
        painted = changed & (out != IGNORE)
        r_acc = (float((painted & (out == lab_c)).sum() / painted.sum())
                 if painted.any() else None)
        # GT-referenced split (where GT exists): "erosion" vs the clean
        # pspnet counts demoting its own iid speckle as a loss; vs GT that
        # demotion is a WIN. erosion_gt = truly-correct supervision lost.
        has_gt = (gt != IGNORE) & labeled
        good = has_gt & (lab_n == gt)
        bad = has_gt & (lab_n != gt)
        erosion_gt = (good & changed & (out != gt)).sum() / max(good.sum(), 1)
        caught_gt = (bad & ((out == IGNORE) | (out == gt)) & changed).sum() \
            / max(bad.sum(), 1)
        still_gt = (out != IGNORE) & has_gt
        residual_gt = ((out != gt) & still_gt).sum() / max(still_gt.sum(), 1)
        row = dict(mode=mode, window=window, tol=tol, min_voters=mv,
                   repaint=rp, caught=round(float(caught), 4),
                   erosion=round(float(erosion), 4),
                   residual=round(float(residual), 4),
                   caught_gt=round(float(caught_gt), 4),
                   erosion_gt=round(float(erosion_gt), 4),
                   residual_gt=round(float(residual_gt), 4),
                   repaint_frac=round(float(painted.sum() / labeled.sum()), 4),
                   repaint_acc=None if r_acc is None else round(r_acc, 4),
                   secs=round(time.time() - t0, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = ((lab_n != lab_c) & labeled).sum() / labeled.sum()
    summary = {"pre_clean_noise": round(float(base), 4), "grid": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
