"""Pseudo-label cleaning (the -360 branch's refined filtering, rebuilt).

The in-loss consistency filter (train/loss.py, reference `pseudo_filter`/
`weight_th`) can only judge pixels whose rays cross 3D primitives; rays
with NO primitive evidence (sky, unannotated geometry) pass their pseudo-
labels through wholesale. BASELINE.md's long-run study shows exactly those
pixels drive the late mIoU/PQ decay: the learned field slowly fits the
segmenter's speckle noise where nothing contradicts it.

PanopticNeRF-360 describes improved label filtering ([pn360], unverified —
SURVEY.md §1 "improved filtering/losses"); the reconstruction here is a
spatial-agreement clean performed once at load time: a pseudo-label that
agrees with fewer than k of its 8 neighbors is demoted to ignore.
Segmenter noise is isolated speckle while true segments are contiguous, so
this removes flip noise with minimal erosion of real boundaries (only
pixels whose label is locally unique go). Host-side numpy on the cold
path; enabled via `data.pseudo_clean_neighbors` (0 = off), ablated on the
synthetic fixture in BASELINE.md.
"""

from __future__ import annotations

import numpy as np

IGNORE = 255


def majority_clean(labels: np.ndarray, k: int, ignore: int = IGNORE) -> np.ndarray:
    """Demote labels with < k agreeing 8-neighbors to `ignore`.

    labels: (H, W) int map. Border pixels see out-of-image neighbors as
    disagreeing (conservative). Ignore-labeled pixels stay ignored and never
    count as agreement.
    """
    if k <= 0:
        return labels
    h, w = labels.shape
    pad = np.full((h + 2, w + 2), ignore, labels.dtype)
    pad[1:-1, 1:-1] = labels
    agree = np.zeros((h, w), np.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = pad[1 + dy : h + 1 + dy, 1 + dx : w + 1 + dx]
            agree += ((nb == labels) & (labels != ignore)).astype(np.int32)
    return np.where((labels != ignore) & (agree < k), ignore, labels)
