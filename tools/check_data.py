#!/usr/bin/env python
"""Validate a KITTI-360 tree against the layout the loader expects.

Reference users arrive with the PanopticNeRF preprocessed layout (see the
expected-tree sketch in panopticnerf_tpu/data/kitti360.py and
docs/MIGRATION.md). This tool walks `data.root` and reports, per stream,
whether it is present and how many frames of the configured window it
covers — BEFORE a long training run discovers a hole. Exit code 0 iff every
stream required by the config flags is usable.

  python tools/check_data.py --cfg_file configs/kitti360_panoptic.yaml
  python tools/check_data.py --root datasets/KITTI-360 --sequence ... \
      --frame_start 3353 --frame_num 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _frames_covered(dir_path: str, frames: list[int], exts: tuple[str, ...]) -> int:
    if not os.path.isdir(dir_path):
        return 0
    have = 0
    for fr in frames:
        if any(os.path.exists(os.path.join(dir_path, f"{fr:010d}{e}")) for e in exts):
            have += 1
    return have


def check_tree(root: str, sequence: str, frames: list[int],
               use_stereo: bool = True, use_fisheye: bool = False,
               use_pspnet: bool = True, use_depth: bool = True) -> dict:
    """Returns {stream: (status, detail)} with status in ok|partial|missing|off.

    Required streams depend on the config flags, mirroring the loader's
    graceful-degradation rules (data/kitti360.py): images+poses+calibration
    are hard requirements; pspnet/sgm/visible_id/GT degrade.
    """
    seq = sequence
    n = len(frames)
    img = lambda cam, sub: os.path.join(root, "data_2d_raw", seq, cam, sub)
    rep: dict[str, tuple[str, bool, str]] = {}

    def put(name, required, path, covered=None):
        if covered is None:
            status = "ok" if os.path.exists(path) else "missing"
            rep[name] = (status, required, path)
        else:
            status = ("ok" if covered == n else
                      "partial" if covered > 0 else "missing")
            rep[name] = (status, required, f"{path}: {covered}/{n} frames")

    put("calibration/perspective", True,
        os.path.join(root, "calibration", "perspective.txt"))
    put("calibration/cam_to_pose", True,
        os.path.join(root, "calibration", "calib_cam_to_pose.txt"))
    put("poses/cam0_to_world", True,
        os.path.join(root, "data_poses", seq, "cam0_to_world.txt"))
    put("images/image_00", True, img("image_00", "data_rect"),
        _frames_covered(img("image_00", "data_rect"), frames, (".png", ".jpg")))
    put("images/image_01", use_stereo, img("image_01", "data_rect"),
        _frames_covered(img("image_01", "data_rect"), frames, (".png", ".jpg")))
    if use_fisheye:
        put("calibration/fisheye_yaml", True,
            os.path.join(root, "calibration", "image_02.yaml"))
        put("poses/imu", True, os.path.join(root, "data_poses", seq, "poses.txt"))
        # image_03 degrades gracefully (left-fisheye-only training works).
        put("images/image_02", True, img("image_02", "data_rgb"),
            _frames_covered(img("image_02", "data_rgb"), frames, (".png", ".jpg")))
        put("images/image_03", False, img("image_03", "data_rgb"),
            _frames_covered(img("image_03", "data_rgb"), frames, (".png", ".jpg")))
    xml = os.path.join(root, "data_3d_bboxes", "train", f"{seq}.xml")
    xml2 = os.path.join(root, "data_3d_bboxes", "train_full", f"{seq}.xml")
    rep["primitives/3d_bboxes"] = (
        ("ok", True, xml) if os.path.exists(xml) else
        ("ok", True, xml2) if os.path.exists(xml2) else ("missing", True, xml))
    put("primitives/visible_id", False, os.path.join(root, "visible_id", seq),
        _frames_covered(os.path.join(root, "visible_id", seq), frames,
                        (".txt", ".npy")))
    put("pseudo_labels/pspnet", use_pspnet,
        os.path.join(root, "pspnet", seq, "image_00"),
        _frames_covered(os.path.join(root, "pspnet", seq, "image_00"), frames,
                        (".npy", ".png")))
    put("depth/sgm", use_depth, os.path.join(root, "sgm", seq, "image_00"),
        _frames_covered(os.path.join(root, "sgm", seq, "image_00"), frames,
                        (".npy", ".png")))
    gt = os.path.join(root, "data_2d_semantics", "train", seq, "image_00")
    put("eval_gt/semantic", False, os.path.join(gt, "semantic"),
        _frames_covered(os.path.join(gt, "semantic"), frames, (".png",)))
    put("eval_gt/instance", False, os.path.join(gt, "instance"),
        _frames_covered(os.path.join(gt, "instance"), frames, (".png",)))
    return rep


def diagnose_depth_units(root: str, sequence: str, frames: list[int],
                         cam: str = "image_00"):
    """Sanity-check SGM depth VALUES, not just presence: catch stored
    millimeters (median ~10^4 after the loader's unit rules) and bogus tiny
    scales (e.g. uint16 meters divided by the mm rule). Returns
    (status, message) with status in ok|warn|none.

    The z-vs-ray-distance CONVENTION cannot be detected from one map — it
    is declared via data.depth_convention (default plane_z; the loader
    converts to ray distance, docs/MIGRATION.md "Depth convention").
    """
    import numpy as np

    base_dir = os.path.join(root, "sgm", sequence, cam)
    # Aggregate over ALL frames: a single sparse/noisy frame (e.g. a
    # handful of far-range SGM points) must not decide the verdict, so the
    # unit test is the median of per-frame medians.
    meds = []
    for fr in frames:
        base = os.path.join(base_dir, f"{fr:010d}")
        if os.path.exists(base + ".npy"):
            arr = np.load(base + ".npy").astype(np.float32)
        elif os.path.exists(base + ".png"):
            from PIL import Image

            raw = np.asarray(Image.open(base + ".png"))
            # mirror data/kitti360._load_depth: uint16 PNGs are millimeters
            arr = (raw.astype(np.float32) / 1000.0 if raw.dtype == np.uint16
                   else raw.astype(np.float32))
        else:
            continue
        valid = arr > 0
        if valid.any():
            meds.append(float(np.median(arr[valid])))
    if not meds:
        return ("none", "no depth frames found to value-check")
    med = float(np.median(meds))
    if med > 200.0:
        return ("warn",
                f"median valid depth {med:.0f} over {len(meds)} frames — "
                f"driving scenes sit at ~5-50 m; values this large look "
                f"like MILLIMETERS stored as meters (float maps are read "
                f"as-is; only uint16 PNGs get the /1000 mm rule)")
    if med < 0.5:
        return ("warn",
                f"median valid depth {med:.3f} m over {len(meds)} frames — "
                f"suspiciously small; uint16 PNGs are interpreted as "
                f"millimeters (/1000), so meters stored as uint16 "
                f"arrive 1000x too small")
    return ("ok", f"median valid depth {med:.1f} m over {len(meds)} frames; "
                  f"interpreted per data.depth_convention "
                  f"(plane_z -> ray distance at load)")


def main() -> int:
    p = argparse.ArgumentParser(description="KITTI-360 layout checker")
    p.add_argument("--cfg_file", default=None)
    p.add_argument("--root", default=None)
    p.add_argument("--sequence", default="2013_05_28_drive_0000_sync")
    p.add_argument("--frame_start", type=int, default=0)
    p.add_argument("--frame_num", type=int, default=64)
    p.add_argument("--frame_step", type=int, default=1)
    args, opts = p.parse_known_args()  # flags may follow KEY VALUE opts
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts

    if args.cfg_file or args.opts:
        # KEY VALUE overrides apply even without --cfg_file (on the default
        # config) — silently ignoring them sent users checking the wrong
        # tree.
        from panopticnerf_tpu.config import load_config

        cfg = load_config(args.cfg_file, args.opts)
        d = cfg.data
        root, seq = d.root, d.sequence
        frames = list(range(d.frame_start, d.frame_start + d.frame_num * d.frame_step,
                            d.frame_step))
        flags = dict(use_stereo=d.use_stereo, use_fisheye=d.use_fisheye,
                     use_pspnet=d.use_pspnet, use_depth=d.use_depth)
    else:
        root = args.root or "datasets/KITTI-360"
        seq = args.sequence
        frames = list(range(args.frame_start,
                            args.frame_start + args.frame_num * args.frame_step,
                            args.frame_step))
        flags = {}

    rep = check_tree(root, seq, frames, **flags)
    width = max(len(k) for k in rep)
    bad = False
    for name, (status, required, detail) in rep.items():
        kind = "required" if required else "optional"
        mark = "+" if status == "ok" else ("!" if required else "~")
        print(f" {mark} {name:<{width}}  {status:<8} {kind:<9} {detail}")
        bad |= required and status != "ok"
    if flags.get("use_depth", True):
        dstat, dmsg = diagnose_depth_units(root, seq, frames)
        if dstat != "none":
            mark = "+" if dstat == "ok" else "!"
            print(f" {mark} {'depth/units':<{width}}  {dstat:<8} {'check':<9} {dmsg}")
            bad |= dstat == "warn"
    if bad:
        print("\nFAIL: required streams missing/partial for this config "
              "(optional streams degrade gracefully; see docs/MIGRATION.md).")
        return 1
    print("\nOK: layout satisfies the configured streams.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
