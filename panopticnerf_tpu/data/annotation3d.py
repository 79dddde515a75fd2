"""KITTI-360 3D bounding-primitive annotation parsing.

Reference vendors kitti360scripts' `annotation.py` (`KITTI360Bbox3D`) to read
`data_3d_bboxes/train/<sequence>.xml` ([pn], unverified — SURVEY.md §2.2).
The XML (an opencv_storage document) stores one node per object with:

  - ``transform``: 4x4 row-major matrix; R = transform[:3,:3] carries
    rotation*scale, T = transform[:3,3]
  - ``vertices`` / ``faces``: the template mesh in the object's local frame
    (a +-0.5 unit cube for cuboids; extruded polygons have more vertices)
  - ``semanticId`` / ``instanceId`` (newer exports) or a ``label`` name
  - ``start_frame`` / ``end_frame`` (visibility window), ``timestamp``
    (-1 = static), ``dynamic`` flag

TPU mapping: every object becomes a world->unit-cube affine over the local
AABB of its template vertices — exact for cuboids, conservative (bounding
box) for extruded polygons. x_unit = D (R^-1 (x - T) - m), D = diag(2/ext),
m = template-AABB center.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from panopticnerf_tpu.data.labels import name2label


@dataclass
class Bbox3D:
    index: int
    semantic_id: int          # raw KITTI-360 id
    instance_id: int          # global instance id (semantic*1000 + local)
    label: str
    world_to_prim: np.ndarray  # (3, 4) world -> [-1,1]^3 local
    start_frame: int
    end_frame: int
    dynamic: bool
    timestamp: int
    vertices_world: np.ndarray = field(repr=False, default=None)  # (V, 3)
    is_cuboid: bool = True
    # Convex refinement for extruded polygons: half-spaces n.x <= b in the
    # primitive's [-1,1]^3 local frame (None for cuboids). See
    # `convex_cut_planes`.
    cut_planes: Optional[np.ndarray] = field(repr=False, default=None)  # (F, 4)


def _monotone_chain_hull(pts: np.ndarray) -> np.ndarray:
    """2D convex hull (CCW) via Andrew's monotone chain; pts (M, 2)."""
    pts = np.unique(np.round(pts, 9), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    cross = lambda o, a, b: (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(tuple(p))
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(tuple(p))
    return np.asarray(lower[:-1] + upper[:-1])


def convex_cut_planes(local_verts: np.ndarray, max_planes: int) -> Optional[np.ndarray]:
    """Side planes of an extruded polygon, in the [-1,1]^3 local frame.

    The extrusion axis is the local axis whose vertex coordinates cluster
    into two rings (fewest distinct values); the cross-section's convex hull
    provides side half-spaces n.x <= b. If the hull needs more than
    `max_planes` sides, the least-significant hull vertices (smallest
    turning area) are dropped — the region only ever GROWS, so the
    approximation stays conservative. Returns (max_planes, 4) padded with
    all-pass planes, or None when the shape is effectively a box.
    """
    v = np.asarray(local_verts, np.float64)

    def _is_extrusion_axis(a: int) -> bool:
        """True iff splitting on axis `a`'s two values yields two rings that
        are identical in the remaining coordinates (a true extrusion)."""
        vals = np.unique(np.round(v[:, a], 6))
        if len(vals) != 2:
            return False
        oth = [x for x in range(3) if x != a]
        lo = v[np.round(v[:, a], 6) == vals[0]][:, oth]
        hi = v[np.round(v[:, a], 6) == vals[1]][:, oth]
        if len(lo) != len(hi):
            return False
        key = lambda r: np.lexsort((r[:, 1], r[:, 0]))
        return np.allclose(lo[key(lo)], hi[key(hi)], atol=1e-6)

    axis = next((a for a in range(3) if _is_extrusion_axis(a)), None)
    if axis is None:
        # Not a clean two-ring extrusion: keep the conservative OBB.
        return None
    others = [a for a in range(3) if a != axis]
    hull = _monotone_chain_hull(v[:, others])
    if len(hull) < 3:
        return None  # degenerate cross-section
    if len(hull) == 4:
        # Box-like only if the hull IS the axis-aligned bounding rectangle
        # (then the OBB slab is already exact).
        lo2, hi2 = hull.min(0), hull.max(0)
        corners = {(lo2[0], lo2[1]), (lo2[0], hi2[1]), (hi2[0], lo2[1]), (hi2[0], hi2[1])}
        if all(any(np.allclose(h, c, atol=1e-6) for c in corners) for h in hull):
            return None
    # Drop smallest-turn vertices until the side count fits.
    hull = list(map(np.asarray, hull))
    while len(hull) > max_planes:
        m = len(hull)
        areas = []
        for i in range(m):
            a, b, c = hull[i - 1], hull[i], hull[(i + 1) % m]
            areas.append(abs(np.cross(b - a, c - b)))
        hull.pop(int(np.argmin(areas)))
    hull = np.asarray(hull)
    planes = np.zeros((max_planes, 4), np.float32)
    planes[:, 3] = 1.0  # all-pass padding: 0.x <= 1
    m = len(hull)
    for i in range(m):
        a, b = hull[i], hull[(i + 1) % m]
        e = b - a
        n2 = np.array([e[1], -e[0]])  # outward for a CCW hull
        norm = np.linalg.norm(n2)
        if norm < 1e-12:
            continue
        n2 /= norm
        n3 = np.zeros(3)
        n3[others[0]], n3[others[1]] = n2
        planes[i, :3] = n3
        planes[i, 3] = float(n2 @ a)
    return planes


def _parse_matrix(node) -> np.ndarray:
    rows = int(node.find("rows").text)
    cols = int(node.find("cols").text)
    data = np.array(node.find("data").text.split(), dtype=np.float64)
    return data.reshape(rows, cols)


def _text(node, name, default=None):
    c = node.find(name)
    return c.text.strip() if c is not None and c.text is not None else default


def parse_bbox_xml(path: str, max_cut_planes: int = 8) -> list[Bbox3D]:
    """Parse one sequence's 3D-annotation XML into Bbox3D records."""
    tree = ET.parse(path)
    root = tree.getroot()
    out = []
    for child in root:
        if child.find("transform") is None or child.find("vertices") is None:
            continue
        transform = _parse_matrix(child.find("transform"))
        verts = _parse_matrix(child.find("vertices"))
        R = transform[:3, :3]
        T = transform[:3, 3]

        label = _text(child, "label", "unknown object")
        sem_txt = _text(child, "semanticId")
        if sem_txt is not None:
            semantic_id = int(float(sem_txt))
        elif label in name2label:
            semantic_id = name2label[label].id
        else:
            semantic_id = name2label["unknown object"].id
        inst_local = int(float(_text(child, "instanceId", "0") or 0))
        index = int(float(_text(child, "index", "-1") or -1))

        # Local AABB of the template -> unit cube affine.
        lo = verts.min(0)
        hi = verts.max(0)
        ext = np.maximum(hi - lo, 1e-6)
        mid = (hi + lo) / 2.0
        R_inv = np.linalg.inv(R)
        D = np.diag(2.0 / ext)
        lin = D @ R_inv
        trans = D @ (-R_inv @ T - mid)
        w2p = np.concatenate([lin, trans[:, None]], axis=1).astype(np.float32)

        verts_world = (R @ verts.T).T + T

        is_cuboid = verts.shape[0] <= 10
        cut = None
        if not is_cuboid and max_cut_planes > 0:
            local_template = (verts - mid) * (2.0 / ext)
            cut = convex_cut_planes(local_template, max_cut_planes)

        out.append(
            Bbox3D(
                index=index,
                semantic_id=semantic_id,
                instance_id=semantic_id * 1000 + inst_local,
                label=label,
                world_to_prim=w2p,
                start_frame=int(float(_text(child, "start_frame", "-1") or -1)),
                end_frame=int(float(_text(child, "end_frame", "-1") or -1)),
                dynamic=bool(int(float(_text(child, "dynamic", "0") or 0))),
                timestamp=int(float(_text(child, "timestamp", "-1") or -1)),
                vertices_world=verts_world.astype(np.float32),
                is_cuboid=is_cuboid,
                cut_planes=cut,
            )
        )
    return out


def load_visible_ids(visible_dir: str, frame: int) -> Optional[np.ndarray]:
    """Per-frame visible-primitive index list (PanopticNeRF preprocessing).

    Accepts `<frame:010d>.txt` (whitespace ints) or `.npy`. Returns None when
    no file exists (caller falls back to window-based visibility).
    """
    base = os.path.join(visible_dir, f"{frame:010d}")
    if os.path.exists(base + ".txt"):
        arr = np.loadtxt(base + ".txt", dtype=np.int64, ndmin=1)
        return arr.astype(np.int64)
    if os.path.exists(base + ".npy"):
        return np.load(base + ".npy").astype(np.int64)
    return None


def boxes_visible_in_frame(boxes: list[Bbox3D], frame: int) -> list[int]:
    """Window-based visibility fallback: static boxes whose [start, end]
    window covers `frame` (end == -1 means open-ended)."""
    out = []
    for i, b in enumerate(boxes):
        if b.dynamic and b.timestamp not in (-1, frame):
            continue
        s = b.start_frame if b.start_frame >= 0 else -(10**9)
        e = b.end_frame if b.end_frame >= 0 else 10**9
        if s <= frame <= e:
            out.append(i)
    return out
