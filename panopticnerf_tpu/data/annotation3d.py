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


def _parse_matrix(node) -> np.ndarray:
    rows = int(node.find("rows").text)
    cols = int(node.find("cols").text)
    data = np.array(node.find("data").text.split(), dtype=np.float64)
    return data.reshape(rows, cols)


def _text(node, name, default=None):
    c = node.find(name)
    return c.text.strip() if c is not None and c.text is not None else default


def parse_bbox_xml(path: str) -> list[Bbox3D]:
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
                is_cuboid=verts.shape[0] <= 10,
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
