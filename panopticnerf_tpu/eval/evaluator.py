"""Accumulating evaluator mirroring the reference's evaluate/summarize API.

Reference: `Evaluator.evaluate(output, batch)` accumulates per frame;
`summarize()` prints/returns PSNR / per-class IoU / mIoU / PQ
([pn] lib/evaluators/panopticnerf.py, unverified — SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from panopticnerf_tpu.eval import metrics
from panopticnerf_tpu.eval.panoptic import fuse_panoptic


class Evaluator:
    def __init__(self, num_classes: int, things: np.ndarray, ignore: int = 255,
                 fixed_blend: float = 0.5):
        self.num_classes = num_classes
        self.things = np.asarray(things, bool)
        self.ignore = ignore
        self.fixed_blend = fixed_blend
        self.reset()

    def reset(self):
        self.psnrs = []
        self.cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        self.pq_stats = {
            "iou_sum": np.zeros(self.num_classes),
            "tp": np.zeros(self.num_classes, np.int64),
            "fp": np.zeros(self.num_classes, np.int64),
            "fn": np.zeros(self.num_classes, np.int64),
        }

    def evaluate(
        self,
        out,                       # RenderOut with flat (H*W) leading dim
        gt_rgb: Optional[np.ndarray] = None,     # (H*W, 3) float in [0,1]
        gt_sem: Optional[np.ndarray] = None,     # (H*W,) int
        gt_inst: Optional[np.ndarray] = None,    # (H*W,) int
    ):
        """Accumulate one rendered frame. Returns this frame's fused maps."""
        if gt_rgb is not None:
            self.psnrs.append(metrics.psnr(np.asarray(out.rgb), gt_rgb))

        sem = inst = None
        if out.sem_logits is not None or out.sem_fixed is not None:
            sem, inst = fuse_panoptic(
                out.sem_logits, out.sem_fixed, out.inst_mass, out.inst_ids,
                out.inst_sem, self.things, self.fixed_blend,
            )
            sem = np.asarray(sem)
            inst = np.asarray(inst)
            if gt_sem is not None:
                self.cm += np.asarray(
                    metrics.confusion_matrix(sem, gt_sem, self.num_classes, self.ignore)
                )
                if gt_inst is not None:
                    st = metrics.panoptic_quality(
                        sem, inst, gt_sem, gt_inst, self.things,
                        self.num_classes, self.ignore,
                    )
                    for k in self.pq_stats:
                        self.pq_stats[k] += st[k]
        return sem, inst

    def summarize(self) -> dict:
        result = {}
        if self.psnrs:
            result["psnr"] = float(np.mean(self.psnrs))
        if self.cm.sum() > 0:
            iou, miou = metrics.iou_from_confusion(self.cm)
            result["iou_per_class"] = iou
            result["miou"] = miou
        if self.pq_stats["tp"].sum() + self.pq_stats["fn"].sum() + self.pq_stats["fp"].sum() > 0:
            pq = metrics.pq_from_stats(self.pq_stats)
            result["pq_per_class"] = pq["pq"]
            result["pq"] = pq["mean_pq"]
            result["sq"] = pq["sq"]
            result["rq"] = pq["rq"]
        return result
