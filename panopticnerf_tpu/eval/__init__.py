from panopticnerf_tpu.eval.evaluator import Evaluator
from panopticnerf_tpu.eval.metrics import (
    confusion_matrix,
    iou_from_confusion,
    panoptic_quality,
    pq_from_stats,
    psnr,
)
from panopticnerf_tpu.eval.panoptic import fuse_panoptic


def make_evaluator(cfg, things=None):
    """Factory mirroring the reference's make_evaluator."""
    import numpy as np

    if things is None:
        from panopticnerf_tpu.data import labels as L

        if cfg.model.num_classes == L.NUM_TRAIN_IDS:
            things = L.TRAINID_HAS_INSTANCES
        else:
            things = np.ones(cfg.model.num_classes, bool)
            things[0] = False  # synthetic convention: class 0 = sky/stuff
    from panopticnerf_tpu.eval.lpips import make_lpips

    return Evaluator(cfg.model.num_classes, things,
                     fixed_blend=cfg.loss.eval_fixed_blend,
                     lpips_fn=make_lpips(cfg.eval.lpips_weights),
                     fusion_rule=cfg.eval.fusion_rule,
                     sky_rule=cfg.eval.sky_rule,
                     sky_class=resolve_sky_class(cfg),
                     sky_eps=cfg.eval.sky_eps)


def resolve_sky_class(cfg) -> int:
    """eval.sky_class, or the auto default: the labels-table sky trainId
    when model.num_classes matches KITTI-360's 19, else class 0 (the
    synthetic fixtures' sky/stuff convention)."""
    if cfg.eval.sky_class >= 0:
        return int(cfg.eval.sky_class)
    from panopticnerf_tpu.data.labels import sky_train_id

    return sky_train_id(cfg.model.num_classes)


__all__ = [
    "Evaluator",
    "confusion_matrix",
    "fuse_panoptic",
    "iou_from_confusion",
    "make_evaluator",
    "panoptic_quality",
    "pq_from_stats",
    "psnr",
    "resolve_sky_class",
]
