#!/usr/bin/env python
"""Export rendered label-transfer maps for the whole frame window.

The reference's end product is 3D-to-2D label transfer: per-frame semantic
and instance maps for the annotated driving sequence ([pn] visualizer
output consumed by the KITTI-360 benchmark; SURVEY.md §1). This tool
renders EVERY frame's image_00 view from a trained checkpoint and writes
the maps in the exact `data_2d_semantics` layout this framework's own
loader consumes as GT —

    <out>/train/<seq>/image_00/semantic/<frame:010d>.png   raw ids (uint8)
    <out>/train/<seq>/image_00/instance/<frame:010d>.png   sem*1000+inst (I;32)

— which makes the export round-trip verifiable (point a dataset's
data_2d_semantics at it and the loader reads it back bit-exact;
tests/test_viz_tools.py). Usage:

    python tools/export_label_transfer.py --cfg_file configs/<x>.yaml \
        --out DIR [--zip] [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export(cfg, out_dir: str, log=print) -> list[str]:
    import jax
    import numpy as np
    from PIL import Image

    from panopticnerf_tpu.engine import _render_view, _restore_for_eval, _eval_mesh
    from panopticnerf_tpu.eval import make_evaluator
    from panopticnerf_tpu.viz.visualizer import semantic_raw_ids

    ds, test_ids, model, params, step = _restore_for_eval(cfg)
    ev = make_evaluator(cfg)
    mesh = _eval_mesh(cfg)
    render = jax.jit(lambda p, v: _render_view(cfg, model, p, ds, v, mesh=mesh))
    lead = jax.process_index() == 0

    h, w = ds.images.shape[1:3]
    n_frames = cfg.data.frame_num
    cams_per_frame = ds.images.shape[0] // n_frames
    sem_dir = os.path.join(out_dir, "train", cfg.data.sequence, "image_00",
                           "semantic")
    inst_dir = os.path.join(out_dir, "train", cfg.data.sequence, "image_00",
                            "instance")
    if lead:
        os.makedirs(sem_dir, exist_ok=True)
        os.makedirs(inst_dir, exist_ok=True)

    written = []
    for i in range(n_frames):
        view = i * cams_per_frame                       # image_00 leads each frame
        frame = cfg.data.frame_start + i * cfg.data.frame_step
        out = render(params, view)
        if not lead:
            continue                                    # render is the collective part
        sem, inst = ev.evaluate(out)
        sem_raw = semantic_raw_ids(np.asarray(sem).reshape(h, w),
                                   cfg.model.num_classes)
        p1 = os.path.join(sem_dir, f"{frame:010d}.png")
        Image.fromarray(sem_raw.astype(np.uint8)).save(p1)
        enc = sem_raw.astype(np.int32) * 1000 + (np.asarray(inst).reshape(h, w) % 1000)
        p2 = os.path.join(inst_dir, f"{frame:010d}.png")
        # uint16 like the real data_2d_semantics instance PNGs (<= ~45k fits)
        Image.fromarray(enc.astype(np.uint16)).save(p2)
        written += [p1, p2]
    log(f"exported {len(written)} label-transfer maps (ckpt step {step}) "
        f"under {out_dir}")
    return written


def main() -> int:
    p = argparse.ArgumentParser(description="label-transfer map export")
    p.add_argument("--cfg_file", default=None)
    p.add_argument("--out", required=True, help="export root directory")
    p.add_argument("--zip", action="store_true",
                   help="also write <out>.zip of the export tree")
    args, opts = p.parse_known_args()
    for tok in opts:
        if tok.startswith("--"):
            p.error(f"unrecognized flag {tok!r}")
    args.opts = opts

    from panopticnerf_tpu.config import make_cfg
    from panopticnerf_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()
    cfg = make_cfg(args)
    export(cfg, args.out)
    if args.zip:
        import jax
        import shutil

        if jax.process_index() == 0:
            z = shutil.make_archive(args.out.rstrip("/"), "zip",
                                    root_dir=args.out)
            print(f"wrote {z}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
