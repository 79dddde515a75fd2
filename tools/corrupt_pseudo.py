#!/usr/bin/env python
"""Clone a demo tree with structurally corrupted pseudo-labels.

The demo tree's pspnet/ labels are GT + iid uniform flips
(data/demo_tree.py) — exactly the noise a per-ray consistency filter
handles trivially and multi-view averaging washes out. Real 2D
segmentation errors are *spatially coherent* per view (whole blobs of a
confusable class: building<->vegetation, road<->sidewalk, car shadows on
road), which is the regime where late-stage training drifts toward the
pseudo-labels (the PQ decay documented since round 1 — BASELINE.md) and
where the -360 papers' improved filtering is supposed to help.

This tool clones a tree (symlinking everything except pspnet/) and
repaints each pseudo-label map with random ellipse blobs of a
confusion-plausible wrong class until ~`--frac` of the valid pixels are
corrupted, per camera image, deterministic in --seed. GT labels
(data_2d_semantics) are untouched, so eval still measures against clean
GT while training supervision carries the structured noise.

Usage: python tools/corrupt_pseudo.py --src /tmp/kitti_tree \
          --dst /tmp/kitti_tree_noisy --frac 0.15 --seed 0
"""
import argparse
import glob
import os

import numpy as np

# raw-id confusion table: label -> classes a real segmenter confuses it with
_CONFUSE = {
    7: [8, 26],        # road -> sidewalk, car(shadow)
    8: [7, 11],        # sidewalk -> road, building
    11: [21, 8],       # building -> vegetation, sidewalk
    21: [11, 23],      # vegetation -> building, sky
    23: [21, 11],      # sky -> vegetation, building
    26: [7, 11],       # car -> road, building
}
_FALLBACK = [7, 11, 21, 23, 26]


def corrupt_map(sem: np.ndarray, frac: float, rng: np.random.Generator):
    h, w = sem.shape
    out = sem.copy()
    valid = sem != 0
    target = frac * max(int(valid.sum()), 1)
    yy, xx = np.mgrid[0:h, 0:w]
    changed = np.zeros((h, w), bool)
    # blobs sized ~2-6% of image height; loop count bounded for safety
    for _ in range(400):
        if changed.sum() >= target:
            break
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry = rng.integers(h // 40 + 1, h // 8 + 2)
        rx = rng.integers(w // 60 + 1, w // 10 + 2)
        ang = rng.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        u = (xx - cx) * ca + (yy - cy) * sa
        v = -(xx - cx) * sa + (yy - cy) * ca
        blob = (u / rx) ** 2 + (v / ry) ** 2 < 1.0
        blob &= valid
        if not blob.any():
            continue
        # repaint the blob with a class confusable with its majority label
        vals, cnts = np.unique(sem[blob], return_counts=True)
        major = int(vals[np.argmax(cnts)])
        wrong = int(rng.choice(_CONFUSE.get(major, _FALLBACK)))
        out[blob] = wrong
        changed |= blob
    return out, changed.sum() / max(int(valid.sum()), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--frac", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    for name in sorted(os.listdir(args.src)):
        sp = os.path.join(args.src, name)
        dp = os.path.join(args.dst, name)
        if name == "pspnet" or os.path.lexists(dp):
            continue
        os.symlink(sp, dp)

    files = sorted(glob.glob(os.path.join(args.src, "pspnet", "**", "*.npy"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no pspnet/*.npy under {args.src}")
    rng = np.random.default_rng(args.seed)
    fracs = []
    for f in files:
        sem = np.load(f)
        out, got = corrupt_map(sem, args.frac, rng)
        rel = os.path.relpath(f, args.src)
        dst_f = os.path.join(args.dst, rel)
        os.makedirs(os.path.dirname(dst_f), exist_ok=True)
        np.save(dst_f, out.astype(np.int32))
        fracs.append(got)
    print(f"corrupted {len(files)} maps: mean blob-frac "
          f"{np.mean(fracs):.3f} (target {args.frac})")


if __name__ == "__main__":
    main()
