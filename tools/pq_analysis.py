#!/usr/bin/env python
"""PQ^Things diagnosis: fusion-rule / fixed_blend sweep + instance error maps.

Round-3 review item 4: PQ^Th is the weakest quality axis on record and its
explanation ("thing-boundary strictness at IoU>0.5") was never verified.
This tool renders every GT view ONCE from a checkpoint, then on the cached
fields:

  1. sweeps `fixed_blend` (the learned/fixed fusion weight) and the
     interval-selection rule (class-agreement-preferring vs raw mass
     argmax) over the full PQ/mIoU stack — the sweep is pure host numpy,
     so 10 fusion variants cost one render pass;
  2. for the shipped fusion, lists every UNMATCHED gt thing segment with
     its best achievable IoU (how far below the 0.5 bar it fell) and
     writes per-view error maps (TP green / FN blue / FP red on things).

Usage:
  python tools/pq_analysis.py --cfg_file configs/kitti360_panoptic.yaml \
      [KEY VALUE ...] [--blends 0,0.25,0.5,0.75,1] [--out out/pq_analysis]

Reference: panoptic fusion + PQ evaluation in [pn] lib/evaluators/
(unverified — SURVEY.md §0); fusion lives in panopticnerf_tpu/eval/panoptic.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="PQ fusion sweep + error maps")
    p.add_argument("--cfg_file", type=str, required=True)
    p.add_argument("--blends", type=str, default="0,0.25,0.5,0.75,1")
    p.add_argument("--out", type=str, default="out/pq_analysis")
    args, opts = p.parse_known_args()
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts
    return args


def main():
    args = parse_args()
    from panopticnerf_tpu.config import make_cfg
    from panopticnerf_tpu.eval import resolve_sky_class
    from panopticnerf_tpu.eval.panoptic import fuse_panoptic
    from panopticnerf_tpu.eval.sweep import cache_gt_views, fusion_sweep

    cfg = make_cfg(args)
    cached, views, step, things, C, ds = cache_gt_views(cfg)
    sky_class = resolve_sky_class(cfg)
    print(f"rendered {len(views)} GT views (ckpt step {step})", flush=True)

    # ---- sweep: fixed_blend x interval-selection rule x sky rule --------
    rows = fusion_sweep(cached, things, C,
                        [float(b) for b in args.blends.split(",")],
                        sky_rules=("off", "empty", "support", "soft:0.5"),
                        sky_class=sky_class)
    for row in rows:
        print(json.dumps(row), flush=True)

    # ---- instance-level misses at the shipped fusion --------------------
    os.makedirs(args.out, exist_ok=True)
    h, w = ds.images.shape[1:3]
    misses = []
    for vi, (v, c) in enumerate(zip(views, cached)):
        sem, inst = fuse_panoptic(
            c["sem_logits"], c["sem_fixed"], c["inst_mass"], c["inst_ids"],
            c["inst_sem"], things, cfg.loss.eval_fixed_blend,
            sky_rule=cfg.eval.sky_rule, sky_class=sky_class)
        sem, inst = np.asarray(sem), np.asarray(inst)
        gt_sem, gt_inst = c["gt_sem"], c["gt_inst"]
        valid = (gt_sem != 255) & (gt_sem >= 0) & (gt_sem < C)
        if c["valid"] is not None:
            valid &= c["valid"]
        err = np.zeros((h * w, 3), np.uint8)
        # every gt thing segment: best IoU against same-class pred segments
        gt_key = gt_sem.astype(np.int64) * 1_000_000 + gt_inst
        pr_key = sem.astype(np.int64) * 1_000_000 + inst
        for key in np.unique(gt_key[valid & things[np.clip(gt_sem, 0, C - 1)]]):
            cls, gi = int(key // 1_000_000), int(key % 1_000_000)
            gmask = (gt_key == key) & valid
            cand = np.unique(pr_key[gmask & (sem == cls)])
            best_iou, best_key = 0.0, None
            for pk in cand:
                pmask = pr_key == pk
                inter = (gmask & pmask).sum()
                union = gmask.sum() + (pmask & valid).sum() - inter
                iou = inter / max(union, 1)
                if iou > best_iou:
                    best_iou, best_key = iou, int(pk)
            matched = best_iou > 0.5
            err[gmask, 2 if not matched else 1] = 255   # FN blue / TP green
            if not matched:
                misses.append({
                    "view": int(v), "class": cls, "instance": gi,
                    "area": int(gmask.sum()), "best_iou": round(best_iou, 3)})
        # FP: predicted thing segments with no gt overlap of same class
        for pk in np.unique(pr_key[valid & things[np.clip(sem, 0, C - 1)]]):
            pmask = (pr_key == pk) & valid
            cls = int(pk // 1_000_000)
            if not ((gt_sem[pmask] == cls)).any():
                err[pmask, 0] = 255                      # FP red
        from PIL import Image

        Image.fromarray(err.reshape(h, w, 3)).save(
            os.path.join(args.out, f"errmap_view{v:04d}.png"))

    misses.sort(key=lambda r: -r["area"])
    print(f"\nunmatched gt thing segments ({len(misses)}):")
    for r in misses[:20]:
        print(json.dumps(r))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump({"sweep": rows, "misses": misses, "ckpt_step": int(step)}, f,
                  indent=1)
    print(f"\nwrote {args.out}/report.json + error maps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
