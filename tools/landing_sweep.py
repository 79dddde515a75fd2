#!/usr/bin/env python
"""Landing-day decision protocol: one command, one pick table.

VERDICT round-4 item 5: the per-dataset picks for `loss.eval_fixed_blend`
(fusion blend), the interval-selection rule, and `loss.filter_fix2d` (a
TRAIN-time knob — sweepable only across checkpoints) lived in a BASELINE.md
paragraph and tribal knowledge. This tool makes the protocol executable:

  python tools/landing_sweep.py --cfg_file configs/kitti360_panoptic.yaml \
      --ckpts default=out/x/trained_model/panopticnerf/exp_a[,nofix=...] \
      [--blends 0,0.25,0.5,0.75,1] [--metric mean] [KEY VALUE ...]

For each named checkpoint it renders the GT views ONCE, re-fuses on the
host across (rule x blend), and prints the full grid plus the winning row
per checkpoint and overall — selected by `--metric`:
  mean  = mean(miou, pq)   (the save_best selection metric)
  pq    = whole-image PQ;  pq_things / pq_stuff = the category splits.
The final line is the exact override string to pass to
`run.py --type evaluate`. Held-out views are whatever the cfg's
`data.test_every` marks as GT-bearing — the same set the evaluator uses.

To sweep the train-time `loss.filter_fix2d`, pass two checkpoints trained
with it on/off (e.g. `fixf=...,nofix=...`); the table compares them on
equal eval footing.

Reference: [pn] lib/evaluators fusion (unverified — SURVEY.md §0); the
measured sweep history is BASELINE.md "Round-4 PQ^Things diagnosis".
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def parse_args():
    p = argparse.ArgumentParser(description="landing-day fusion pick table")
    p.add_argument("--cfg_file", type=str, required=True)
    p.add_argument("--ckpts", type=str, required=True,
                   help="name=trained_model_dir[,name2=dir2...]; dir is the "
                        "directory holding the step checkpoints (the cfg's "
                        "trained_model_dir for that run)")
    p.add_argument("--blends", type=str, default="0,0.25,0.5,0.75,1")
    p.add_argument("--sky_rules", type=str,
                   default="off,empty,support,soft:0.5",
                   help="eval.sky_rule variants to grid over (empty-ray "
                        "sky prior — eval/panoptic.py; soft:<w> is the "
                        "graded support rule)")
    p.add_argument("--metric", type=str, default="mean",
                   choices=["mean", "pq", "pq_things", "pq_stuff", "miou"])
    p.add_argument("--out", type=str, default="out/landing_sweep.json")
    args, opts = p.parse_known_args()
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts
    return args


def score(row, metric):
    if metric == "mean":
        return 0.5 * (row["miou"] + row["pq"])
    v = row.get(metric)
    return -1.0 if v is None else v


def main():
    args = parse_args()
    from panopticnerf_tpu.config import make_cfg
    from panopticnerf_tpu.eval import resolve_sky_class
    from panopticnerf_tpu.eval.sweep import cache_gt_views, fusion_sweep

    blends = [float(b) for b in args.blends.split(",")]
    sky_rules = tuple(s.strip() for s in args.sky_rules.split(","))
    all_rows, best = [], None
    for spec in args.ckpts.split(","):
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--ckpts entry {spec!r} must be name=dir")
        # trained_model_dir is the derived <model_dir>/<task>/<exp_name>;
        # split the given directory back into those three components.
        path = path.rstrip("/")
        exp_name = os.path.basename(path)
        task = os.path.basename(os.path.dirname(path))
        model_dir = os.path.dirname(os.path.dirname(path))
        if not task or not model_dir:
            raise SystemExit(
                f"--ckpts dir {path!r} must look like <model_dir>/<task>/<exp_name>")
        cfg = make_cfg(args)
        cfg.model_dir, cfg.task, cfg.exp_name = model_dir, task, exp_name
        cached, views, step, things, C, _ = cache_gt_views(cfg)
        print(f"[{name}] rendered {len(views)} GT views (step {step})",
              flush=True)
        rows = fusion_sweep(cached, things, C, blends, sky_rules=sky_rules,
                            sky_class=resolve_sky_class(cfg))
        for r in rows:
            r = dict(ckpt=name, step=int(step), **r)
            r["score"] = round(score(r, args.metric), 4)
            all_rows.append(r)
            print(json.dumps(r), flush=True)
        top = max((r for r in all_rows if r["ckpt"] == name),
                  key=lambda r: r["score"])
        print(f"[{name}] pick: rule={top['rule']} blend={top['blend']} "
              f"sky_rule={top['sky_rule']} ({args.metric}={top['score']})",
              flush=True)
        if best is None or top["score"] > best["score"]:
            best = top

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"metric": args.metric, "rows": all_rows, "pick": best}, f,
                  indent=1)
    print(f"\nwrote {args.out}")
    print(f"PICK ckpt={best['ckpt']} rule={best['rule']} "
          f"blend={best['blend']} sky_rule={best['sky_rule']} "
          f"-> evaluate with:")
    rule_flag = ("eval.fusion_rule " + best["rule"] + " "
                 if best["rule"] != "match" else "")
    sky_flag = ("eval.sky_rule " + best["sky_rule"] + " "
                if best["sky_rule"] != "off" else "")
    print(f"  python run.py --type evaluate --cfg_file {args.cfg_file} "
          f"{rule_flag}{sky_flag}loss.eval_fixed_blend {best['blend']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
