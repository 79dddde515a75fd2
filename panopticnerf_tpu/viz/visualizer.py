"""Visualizer: colorized rgb / depth / semantic / panoptic image output.

Reference: `Visualizer` in [pn] lib/visualizers/panopticnerf.py (unverified —
SURVEY.md §2.2): writes rendered maps with the KITTI-360 palette and
assembles videos. Colorization is a single palette gather (labels.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data import labels as L


def _instance_palette(n: int = 256, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = rng.integers(40, 255, (n, 3)).astype(np.uint8)
    pal[0] = 0
    return pal


def depth_to_color(depth: np.ndarray, d_min: float | None = None, d_max: float | None = None) -> np.ndarray:
    """Simple perceptual ramp (dark blue near -> yellow far) without mpl."""
    d = np.asarray(depth, np.float32)
    lo = d_min if d_min is not None else float(np.percentile(d[d > 0], 2)) if (d > 0).any() else 0.0
    hi = d_max if d_max is not None else float(np.percentile(d[d > 0], 98)) if (d > 0).any() else 1.0
    t = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    r = np.clip(1.5 * t, 0, 1)
    g = np.clip(1.5 * t - 0.25, 0, 1)
    b = np.clip(1.0 - 1.2 * t, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def semantic_raw_ids(sem: np.ndarray, num_classes: int) -> np.ndarray:
    """Map a rendered semantic map back to canonical KITTI-360 raw ids.

    Models trained in trainId space (num_classes == 19) invert the
    trainId -> id table; raw-id models pass through. Shared by the
    per-view visualizer writes and tools/export_label_transfer.py."""
    if num_classes == L.NUM_TRAIN_IDS:
        train_to_id = np.zeros(L.NUM_TRAIN_IDS + 1, np.int32)
        for t in range(L.NUM_TRAIN_IDS):
            train_to_id[t] = L.trainId2label[t].id
        return train_to_id[np.clip(sem, 0, L.NUM_TRAIN_IDS)]
    return np.asarray(sem, np.int32)


class Visualizer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.out_dir = cfg.result_path
        os.makedirs(self.out_dir, exist_ok=True)
        if cfg.data.dataset == "kitti360" and cfg.model.num_classes == L.NUM_TRAIN_IDS:
            self.sem_palette = np.concatenate([L.TRAINID_COLOR[:-1], np.zeros((237, 3), np.uint8)])
        else:
            self.sem_palette = _instance_palette(256, seed=7)
            self.sem_palette[0] = (70, 130, 180)  # synthetic sky
        self.inst_palette = _instance_palette()

    def colorize_sem(self, sem: np.ndarray) -> np.ndarray:
        return self.sem_palette[np.clip(sem, 0, 255)]

    def colorize_panoptic(self, sem: np.ndarray, inst: np.ndarray) -> np.ndarray:
        """Semantic palette, with thing pixels tinted by instance id."""
        base = self.colorize_sem(sem).astype(np.int32)
        tint = self.inst_palette[np.asarray(inst) % 256].astype(np.int32)
        is_thing = np.asarray(inst) > 0
        out = np.where(is_thing[..., None], (base + tint) // 2, base)
        return out.astype(np.uint8)

    def _save(self, name: str, arr: np.ndarray) -> str:
        from PIL import Image

        path = os.path.join(self.out_dir, name)
        Image.fromarray(arr).save(path)
        return path

    def write_view(
        self,
        view: int,
        out,                       # RenderOut, flat H*W
        hw: tuple[int, int],
        sem: Optional[np.ndarray] = None,
        inst: Optional[np.ndarray] = None,
        gt_rgb: Optional[np.ndarray] = None,
    ) -> list[str]:
        h, w = hw
        files = []
        rgb = (np.asarray(out.rgb).reshape(h, w, 3).clip(0, 1) * 255).astype(np.uint8)
        files.append(self._save(f"{view:06d}_rgb.png", rgb))
        files.append(self._save(f"{view:06d}_depth.png",
                                depth_to_color(np.asarray(out.depth).reshape(h, w))))
        if sem is not None:
            files.append(self._save(f"{view:06d}_semantic.png",
                                    self.colorize_sem(sem.reshape(h, w))))
        if sem is not None and inst is not None:
            files.append(self._save(f"{view:06d}_panoptic.png",
                                    self.colorize_panoptic(sem.reshape(h, w), inst.reshape(h, w))))
        if gt_rgb is not None:
            files.append(self._save(f"{view:06d}_gt.png",
                                    (gt_rgb.reshape(h, w, 3) * 255).astype(np.uint8)))
        return files

    def write_label_transfer(self, view: int, sem: np.ndarray, inst: np.ndarray,
                             hw: tuple[int, int]) -> list[str]:
        """KITTI-360 submission-style label maps: a semantic png (raw ids
        when training in trainId space we invert the mapping where unique)
        and an instance png encoding semantic*1000 + instance — the format
        of data_2d_semantics (the reference's label-transfer output)."""
        from PIL import Image

        h, w = hw
        sem_raw = semantic_raw_ids(np.asarray(sem).reshape(h, w),
                                   self.cfg.model.num_classes)
        inst = np.asarray(inst).reshape(h, w)
        files = []
        p1 = os.path.join(self.out_dir, f"{view:06d}_labelsem.png")
        Image.fromarray(sem_raw.astype(np.uint8)).save(p1)
        files.append(p1)
        enc = sem_raw.astype(np.int32) * 1000 + (np.asarray(inst) % 1000)
        p2 = os.path.join(self.out_dir, f"{view:06d}_labelinst.png")
        Image.fromarray(enc.astype(np.uint16)).save(p2)
        files.append(p2)
        return files

    def write_video(self, pattern_suffix: str = "_rgb.png", name: str = "video.mp4", fps: int = 10):
        """Assemble written frames into a video (imageio; best-effort)."""
        import glob

        frames = sorted(glob.glob(os.path.join(self.out_dir, f"*{pattern_suffix}")))
        if not frames:
            return None
        try:
            import imageio.v2 as imageio

            path = os.path.join(self.out_dir, name)
            with imageio.get_writer(path, fps=fps) as wtr:
                for f in frames:
                    wtr.append_data(imageio.imread(f))
            return path
        except Exception:
            return None
