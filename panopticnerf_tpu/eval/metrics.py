"""Evaluation metrics: PSNR, confusion-matrix mIoU, panoptic quality (PQ).

Reference: `Evaluator` in [pn] lib/evaluators/panopticnerf.py (unverified —
SURVEY.md §2.2): PSNR on rendered RGB, mIoU from an accumulated confusion
matrix vs manually-annotated KITTI-360 frames, PQ via IoU>0.5 segment
matching (PQ = SQ * RQ).

The confusion matrix is computed on device (one bincount over H*W pixels);
segment matching for PQ runs on host numpy — it's per-eval-frame, tiny, and
irregular (variable segment counts), exactly what should NOT be forced into
fixed shapes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if mask is not None:
        m = np.asarray(mask, bool)
        if m.sum() == 0:
            return float("nan")
        mse = float(np.mean(((pred - gt) ** 2)[m]))
    else:
        mse = float(np.mean((pred - gt) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int, ignore: int = 255):
    """Dense (C, C) confusion matrix [gt, pred]; ignore-labeled pixels dropped."""
    pred = jnp.asarray(pred).reshape(-1)
    gt = jnp.asarray(gt).reshape(-1)
    valid = (gt != ignore) & (gt >= 0) & (gt < num_classes)
    idx = jnp.where(valid, gt * num_classes + jnp.clip(pred, 0, num_classes - 1), num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1]
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray):
    """Per-class IoU + mIoU over classes present in GT or prediction."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    denom = tp + fp + fn
    iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
    miou = float(np.nanmean(iou)) if np.isfinite(iou).any() else float("nan")
    return iou, miou


def panoptic_quality(
    pred_sem: np.ndarray,
    pred_inst: np.ndarray,
    gt_sem: np.ndarray,
    gt_inst: np.ndarray,
    things: np.ndarray,
    num_classes: int,
    ignore: int = 255,
):
    """Per-image PQ statistics (accumulate across frames, then summarize).

    Segments: for 'thing' classes every (class, instance) pair is a segment;
    for 'stuff' classes the whole class mask is one segment (instance 0) —
    the standard COCO-panoptic convention the reference follows
    ([pn] lib/evaluators/panopticnerf.py via panopticapi).

    Void handling follows panopticapi pq_compute exactly:
    - gt segments exist on valid (non-void) pixels only; match IoU uses
      `inter / (gt_area + pred_full_area - inter - pred_void_overlap)` —
      algebraically identical to clipping pred segments to valid pixels;
    - an UNMATCHED predicted segment whose void overlap exceeds half its
      full area is DROPPED, not counted FP (a prediction mostly over
      unlabeled ground truth is unjudgeable, not wrong).

    Returns dict of per-class arrays: iou_sum, tp, fp, fn (each (C,)).
    """
    pred_sem = np.asarray(pred_sem).reshape(-1)
    pred_inst = np.asarray(pred_inst).reshape(-1)
    gt_sem = np.asarray(gt_sem).reshape(-1)
    gt_inst = np.asarray(gt_inst).reshape(-1)
    things = np.asarray(things, bool)

    valid = (gt_sem != ignore) & (gt_sem >= 0) & (gt_sem < num_classes)

    # Combined (class, instance) segment ids; stuff segments collapse to
    # instance 0. gt over valid pixels only; pred over ALL pixels so that
    # full areas and void overlaps are available for the FP-drop rule.
    gs, gi = gt_sem[valid], gt_inst[valid]
    gi = np.where(things[np.clip(gs, 0, num_classes - 1)], gi, 0)
    ps_all, pi_all = pred_sem, pred_inst
    p_in_range = (ps_all >= 0) & (ps_all < num_classes)
    pi_all = np.where(p_in_range & things[np.clip(ps_all, 0, num_classes - 1)],
                      pi_all, 0)

    def unique_segs(sem, inst):
        key = sem.astype(np.int64) * 1_000_000 + inst.astype(np.int64)
        uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        return uniq, inv, cnt

    g_uniq, g_inv, g_cnt = unique_segs(gs, gi)
    p_uniq, p_inv_all, p_cnt = unique_segs(ps_all, pi_all)  # p_cnt = FULL areas
    p_void = np.bincount(p_inv_all[~valid], minlength=len(p_uniq))

    # Intersection counts between every (gt segment, pred segment) pair
    # present on valid pixels.
    pair_key = g_inv.astype(np.int64) * len(p_uniq) + p_inv_all[valid]
    pair_uniq, pair_cnt = np.unique(pair_key, return_counts=True)
    gt_idx = pair_uniq // len(p_uniq)
    pr_idx = pair_uniq % len(p_uniq)

    iou_sum = np.zeros(num_classes)
    tp = np.zeros(num_classes, np.int64)
    fp = np.zeros(num_classes, np.int64)
    fn = np.zeros(num_classes, np.int64)

    g_matched = np.zeros(len(g_uniq), bool)
    p_matched = np.zeros(len(p_uniq), bool)

    g_class = (g_uniq // 1_000_000).astype(np.int64)
    p_class = (p_uniq // 1_000_000).astype(np.int64)

    for k in range(len(pair_uniq)):
        gidx, pidx = gt_idx[k], pr_idx[k]
        if g_class[gidx] != p_class[pidx]:
            continue
        inter = pair_cnt[k]
        union = g_cnt[gidx] + p_cnt[pidx] - inter - p_void[pidx]
        iou = inter / union
        if iou > 0.5:
            c = g_class[gidx]
            tp[c] += 1
            iou_sum[c] += iou
            g_matched[gidx] = True
            p_matched[pidx] = True

    for i in range(len(g_uniq)):
        if not g_matched[i]:
            fn[g_class[i]] += 1
    for i in range(len(p_uniq)):
        if p_matched[i]:
            continue
        # panopticapi FP-drop rule: majority-void predictions are unjudged.
        if p_void[i] * 2 > p_cnt[i]:
            continue
        c = p_class[i]
        if 0 <= c < num_classes:  # out-of-range pred sem carries no class
            fp[c] += 1

    return {"iou_sum": iou_sum, "tp": tp, "fp": fp, "fn": fn}


def pq_from_stats(stats: dict):
    """Summarize accumulated PQ stats -> (per-class PQ/SQ/RQ, mean PQ)."""
    tp = stats["tp"].astype(np.float64)
    fp = stats["fp"].astype(np.float64)
    fn = stats["fn"].astype(np.float64)
    iou_sum = stats["iou_sum"]
    denom = tp + 0.5 * fp + 0.5 * fn
    present = denom > 0
    sq = np.where(tp > 0, iou_sum / np.maximum(tp, 1), 0.0)
    rq = np.where(present, tp / np.maximum(denom, 1e-9), 0.0)
    pq = sq * rq
    mean_pq = float(pq[present].mean()) if present.any() else float("nan")
    return {"pq": pq, "sq": sq, "rq": rq, "present": present, "mean_pq": mean_pq}


# ---------------------------------------------------------------- SSIM / depth
# The reference papers report SSIM (and LPIPS) alongside PSNR for appearance,
# and standard depth errors vs stereo/lidar for geometry ([pn360] T-PAMI'25
# experiments; [pn] lib/evaluators/panopticnerf.py is unverifiable here —
# SURVEY.md §0). SSIM follows Wang et al. 2004 exactly: 11x11 Gaussian
# window (sigma 1.5), C1=(0.01L)^2, C2=(0.03L)^2, 'valid' windows only.
# LPIPS lives in eval/lpips.py behind eval.lpips_weights (pretrained conv
# weights are download-gated; see docs/MIGRATION.md 'LPIPS').

def _ssim_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def ssim(pred: np.ndarray, gt: np.ndarray,
         mask: Optional[np.ndarray] = None, data_range: float = 1.0) -> float:
    """Mean SSIM over valid 11x11 windows (channel-averaged for RGB).

    pred/gt: (H, W) or (H, W, C) float arrays; mask: optional (H, W) bool —
    a window counts iff its center pixel is valid (fisheye circle crop).
    """
    from scipy.ndimage import correlate1d

    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    win = _ssim_window()
    half = len(win) // 2

    def filt(img):  # separable 11x11 gaussian over H, W per channel
        out = correlate1d(img, win, axis=0, mode="constant")
        return correlate1d(out, win, axis=1, mode="constant")

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p, mu_g = filt(pred), filt(gt)
    var_p = filt(pred * pred) - mu_p ** 2
    var_g = filt(gt * gt) - mu_g ** 2
    cov = filt(pred * gt) - mu_p * mu_g
    smap = ((2 * mu_p * mu_g + c1) * (2 * cov + c2)
            / ((mu_p ** 2 + mu_g ** 2 + c1) * (var_p + var_g + c2)))
    # 'valid' windows only (the constant-pad ring is not a real window)
    smap = smap[half:-half, half:-half]
    if smap.size == 0:  # image smaller than the 11x11 window: no valid windows
        return float("nan")
    if mask is not None:
        m = np.asarray(mask, bool)[half:-half, half:-half]
        if not m.any():
            return float("nan")
        return float(smap[m].mean())
    return float(smap.mean())


def depth_error_sums(pred: np.ndarray, gt: np.ndarray,
                     valid: Optional[np.ndarray] = None) -> dict:
    """Accumulable sums for standard depth metrics (Eigen protocol):
    RMSE, abs-rel, and delta<1.25 accuracy. gt<=0 marks missing depth
    (SGM holes); both pred and gt are ray-distance meters (the repo-wide
    convention — docs/MIGRATION.md 'Depth convention')."""
    pred = np.asarray(pred, np.float64).reshape(-1)
    gt = np.asarray(gt, np.float64).reshape(-1)
    m = gt > 0
    if valid is not None:
        m &= np.asarray(valid, bool).reshape(-1)
    p, g = pred[m], gt[m]
    ratio = np.maximum(p / np.maximum(g, 1e-9), g / np.maximum(p, 1e-9))
    return {
        "n": int(m.sum()),
        "se_sum": float(((p - g) ** 2).sum()),
        "absrel_sum": float((np.abs(p - g) / np.maximum(g, 1e-9)).sum()),
        "delta125": int((ratio < 1.25).sum()),
    }


def depth_from_sums(s: dict) -> dict:
    n = max(s["n"], 1)
    return {
        "depth_rmse": float(np.sqrt(s["se_sum"] / n)),
        "depth_abs_rel": float(s["absrel_sum"] / n),
        "depth_delta125": float(s["delta125"] / n),
    }
