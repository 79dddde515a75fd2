"""Pseudo-label cleaning (the -360 branch's refined filtering, rebuilt).

The in-loss consistency filter (train/loss.py, reference `pseudo_filter`/
`weight_th`) can only judge pixels whose rays cross 3D primitives; rays
with NO primitive evidence (sky, unannotated geometry) pass their pseudo-
labels through wholesale, and a wrong label whose class ALSO has primitive
mass on the ray (overlapping road/sidewalk boxes) passes it too —
BASELINE.md's round-4 structured-noise ablation pins the residual PQ^St
gap on exactly that ambiguity.

PanopticNeRF-360 describes improved label filtering ([pn360], unverified —
SURVEY.md §1 "improved filtering/losses"); two load-time reconstructions
live here, both host-side numpy on the cold path:

  * `majority_clean` — spatial agreement: a pseudo-label that agrees with
    fewer than k of its 8 neighbors is demoted to ignore. Removes
    segmenter speckle (isolated flips); coherent blob errors survive by
    construction. `data.pseudo_clean_neighbors` (0 = off).
  * `cross_view_clean` — multi-view agreement: unproject each labeled
    pixel through its stereo (SGM) depth, reproject into nearby views,
    depth-verify the correspondence against the TARGET view's depth
    (occlusion test), and demote labels that LOSE the majority vote among
    verified voters. Coherent per-view blobs are exactly what this
    catches: a segmenter hallucination in one view is contradicted by the
    same 3D surface seen clean from neighboring frames and the stereo
    pair. `data.pseudo_cross_view` (frame window, 0 = off).
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


def cross_view_clean(
    labels: np.ndarray,
    depths: np.ndarray,
    Ks: np.ndarray,
    c2ws: np.ndarray,
    view_frames: np.ndarray,
    persp: np.ndarray,
    window: int,
    tol: float = 0.1,
    min_voters: int = 2,
    ignore: int = IGNORE,
) -> np.ndarray:
    """Demote pseudo-labels that lose a depth-verified cross-view vote.

    labels: (V, H, W) int pseudo-label maps (modified copies returned);
    depths: (V, H, W) RAY-distance depth (0 = invalid — views without an
    SGM stream, e.g. KITTI-360's image_01, neither vote nor get cleaned);
    Ks: (V, 3, 3); c2ws: (V, 3, 4) cam->world; view_frames: (V,) source
    frame index per view; persp: (V,) bool perspective-camera mask (the
    pinhole unprojection does not apply to MEI fisheye views);
    window: vote from views within +-window frames (the stereo pair at the
    same frame is included — it is the strongest voter).

    A vote from view j on pixel p of view i requires: p has depth, the
    unprojected point lands in j's image, j has depth there, and j's depth
    agrees with the projected ray distance within tol (relative) — i.e. the
    surface is actually VISIBLE in j, not occluded. The pixel is demoted to
    `ignore` when at least `min_voters` verified votes exist and strict
    more disagree than agree with its label. Labels are never replaced,
    only demoted: removal deletes the bad gradient (the round-4 ablation's
    winning pattern) without trusting reprojection at thin structures.
    """
    V, H, W = labels.shape
    out = labels.copy()
    if window < 0:
        return out
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    ones = np.ones_like(us)
    uv1 = np.stack([us, vs, ones], axis=-1).reshape(-1, 3)  # (HW, 3)

    agree = np.zeros((V, H * W), np.int32)
    disagree = np.zeros((V, H * W), np.int32)

    # Precompute per-view unit ray directions in camera frame.
    unit_dirs = []
    for i in range(V):
        if not persp[i]:
            unit_dirs.append(None)
            continue
        d_cam = uv1 @ np.linalg.inv(Ks[i]).T          # (HW, 3), z=1 rays
        unit_dirs.append(d_cam / np.linalg.norm(d_cam, axis=-1, keepdims=True))

    for i in range(V):
        if not persp[i]:
            continue
        d_i = depths[i].reshape(-1)
        lab_i = labels[i].reshape(-1)
        src = (d_i > 0) & (lab_i != ignore)
        if not src.any():
            continue
        R_i, t_i = c2ws[i, :, :3], c2ws[i, :, 3]
        X = (unit_dirs[i][src] * d_i[src, None]) @ R_i.T + t_i  # (S, 3) world
        for j in range(V):
            if j == i or not persp[j]:
                continue
            if abs(int(view_frames[i]) - int(view_frames[j])) > window:
                continue
            if not (depths[j] > 0).any():
                continue
            R_j, t_j = c2ws[j, :, :3], c2ws[j, :, 3]
            x_cam = (X - t_j) @ R_j                   # R_j^T (X - t) rowwise
            d_proj = np.linalg.norm(x_cam, axis=-1)
            uvw = x_cam @ Ks[j].T
            with np.errstate(divide="ignore", invalid="ignore"):
                u = uvw[:, 0] / uvw[:, 2]
                v = uvw[:, 1] / uvw[:, 2]
            ui = np.rint(u).astype(np.int64)
            vi = np.rint(v).astype(np.int64)
            ok = (uvw[:, 2] > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            ui, vi = np.clip(ui, 0, W - 1), np.clip(vi, 0, H - 1)
            d_j = depths[j][vi, ui]
            lab_j = labels[j][vi, ui]
            verified = ok & (d_j > 0) & (lab_j != ignore) & (
                np.abs(d_j - d_proj) < tol * d_proj)
            idx = np.flatnonzero(src)
            same = lab_j == lab_i[src]
            np.add.at(agree[i], idx[verified & same], 1)
            np.add.at(disagree[i], idx[verified & ~same], 1)

    votes = agree + disagree
    demote = (votes >= min_voters) & (disagree > agree)
    flat = out.reshape(V, -1)
    flat[demote] = ignore
    return flat.reshape(V, H, W)
