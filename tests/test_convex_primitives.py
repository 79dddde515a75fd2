"""Convex extruded-polygon primitives: hull extraction + exact intervals."""

import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.data.annotation3d import _monotone_chain_hull, convex_cut_planes
from panopticnerf_tpu.ops.intersect import Primitives, ray_box_intervals


def _prism_local_verts(n_sides=3, half_h=1.0):
    """Extruded polygon in the local frame; polygon spans [-1,1] box."""
    ang = np.linspace(0, 2 * np.pi, n_sides, endpoint=False)
    ring = np.stack([np.cos(ang), np.sin(ang)], 1)
    # normalize ring into [-1, 1] envelope
    ring = ring / np.abs(ring).max()
    top = np.concatenate([ring, np.full((n_sides, 1), half_h)], 1)
    bot = np.concatenate([ring, np.full((n_sides, 1), -half_h)], 1)
    return np.concatenate([top, bot])  # (2n, 3), extrusion axis = z


def test_monotone_chain_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]])
    hull = _monotone_chain_hull(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_cut_planes_box_returns_none():
    cube = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], float)
    assert convex_cut_planes(cube, 8) is None


def test_cut_planes_triangle_prism_contains_exactly():
    verts = _prism_local_verts(3)
    planes = convex_cut_planes(verts, 8)
    assert planes is not None
    n, b = planes[:, :3], planes[:, 3]
    # every vertex satisfies all half-spaces (with tolerance)
    assert (verts @ n.T <= b[None] + 1e-6).all()
    # centroid strictly inside; a point outside the triangle but inside the
    # bounding box violates at least one plane
    assert (np.zeros(3) @ n.T <= b + 1e-9).all()
    outside = np.array([-0.9, -0.9, 0.0])  # box corner, outside the triangle
    assert ((outside @ n.T) > b + 1e-6).any()


def test_prism_intersection_vs_oracle():
    """Rays vs rotated/translated triangular prism: exact interval match."""
    rng = np.random.default_rng(0)
    local = _prism_local_verts(3)
    planes = convex_cut_planes(local, 8)

    # place the prism in world: rotate about y + translate
    a = 0.7
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    T = np.array([1.0, 0.5, 8.0])
    # world->local is R^T (x - T) (local frame already spans [-1,1])
    lin = R.T
    w2p = np.concatenate([lin, (-lin @ T)[:, None]], 1).astype(np.float32)

    prims = Primitives(
        world_to_prim=jnp.asarray(w2p)[None],
        semantic=jnp.asarray([3]),
        instance=jnp.asarray([1]),
        valid=jnp.asarray([True]),
        cut_planes=jnp.asarray(planes)[None],
    )
    n_rays = 24
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    o[:, 2] = 0.0
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5  # generally forward
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_in, t_out, hit = map(
        np.asarray,
        ray_box_intervals(jnp.asarray(o), jnp.asarray(d), prims, 0.01, 50.0),
    )

    # oracle: march points, test all half-spaces in local frame + box bound
    ts = np.linspace(0.01, 50.0, 8000)
    pts = o[:, None, :] + d[:, None, :] * ts[None, :, None]
    local_pts = (pts - T) @ R  # R^T applied from the right
    inside_box = (np.abs(local_pts) <= 1 + 1e-9).all(-1)
    n_pl, b_pl = planes[:, :3], planes[:, 3]
    inside_planes = (local_pts @ n_pl.T <= b_pl[None, None] + 1e-9).all(-1)
    inside = inside_box & inside_planes
    for r in range(n_rays):
        any_in = inside[r].any()
        if not any_in and not hit[r, 0]:
            continue
        if hit[r, 0] and not any_in:
            assert t_out[r, 0] - t_in[r, 0] < 2 * (50.0 / 8000), r  # grazing
            continue
        assert hit[r, 0], r
        t_first = ts[inside[r].argmax()]
        t_last = ts[len(ts) - 1 - inside[r][::-1].argmax()]
        assert abs(t_first - t_in[r, 0]) < 0.02, r
        assert abs(t_last - t_out[r, 0]) < 0.02, r


def test_cut_planes_tighter_than_obb():
    """The convex interval must be a subset of the OBB interval."""
    local = _prism_local_verts(5)
    planes = convex_cut_planes(local, 8)
    w2p = np.concatenate([np.eye(3), -np.array([[0.0], [0.0], [5.0]])], 1)
    base = dict(
        world_to_prim=jnp.asarray(w2p, jnp.float32)[None],
        semantic=jnp.asarray([1]), instance=jnp.asarray([1]),
        valid=jnp.asarray([True]),
    )
    o = jnp.asarray(np.array([[0.8, 0.8, 0.0]], np.float32))  # near a box corner
    d = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    t_obb = ray_box_intervals(o, d, Primitives(**base), 0.01, 50.0)
    t_cvx = ray_box_intervals(
        o, d, Primitives(**base, cut_planes=jnp.asarray(planes)[None]), 0.01, 50.0
    )
    # OBB hits (corner is inside the box); pentagon may or may not contain it
    assert bool(np.asarray(t_obb[2])[0, 0])
    if bool(np.asarray(t_cvx[2])[0, 0]):
        assert float(t_cvx[0][0, 0]) >= float(t_obb[0][0, 0]) - 1e-5
        assert float(t_cvx[1][0, 0]) <= float(t_obb[1][0, 0]) + 1e-5


def test_reduce_hull_only_grows():
    """Edge-drop reduction circumscribes: every input vertex stays inside
    (the old vertex-drop reduction excluded octagon vertices)."""
    from panopticnerf_tpu.data.annotation3d import _poly_planes

    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    octagon = np.stack([np.cos(ang), np.sin(ang)], 1)
    planes = _poly_planes(_monotone_chain_hull(octagon).astype(np.float64), [0, 1], 4)
    n2, b = planes[:, :2], planes[:, 3]
    assert (octagon @ n2.T <= b[None] + 1e-6).all()


def _l_shape_verts():
    """L footprint (concave), extruded along z in template coords."""
    L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], float)
    return np.concatenate(
        [np.concatenate([L, np.zeros((6, 1))], 1),
         np.concatenate([L, np.ones((6, 1))], 1)]
    )


def test_decompose_extrusion_l_shape_exact():
    """Concave L decomposes into convex pieces whose union IS the L: the
    concavity corner is excluded (the hull used to over-cover it)."""
    from panopticnerf_tpu.data.annotation3d import decompose_extrusion

    pieces = decompose_extrusion(_l_shape_verts(), 8)
    assert pieces is not None and len(pieces) >= 2

    def inside(p3):
        for lo, hi, poly, others in pieces:
            if not ((p3 >= lo - 1e-9).all() and (p3 <= hi + 1e-9).all()):
                continue
            p2 = p3[others]
            m = len(poly)
            if all(
                float((lambda e, q: e[0] * q[1] - e[1] * q[0])(
                    poly[(i + 1) % m] - poly[i], p2 - poly[i])) >= -1e-9
                for i in range(m)
            ):
                return True
        return False

    assert inside(np.array([0.5, 0.5, 0.5]))
    assert inside(np.array([1.5, 0.5, 0.5]))
    assert inside(np.array([0.5, 1.5, 0.5]))
    assert not inside(np.array([1.5, 1.5, 0.5]))  # the concavity
    assert not inside(np.array([2.5, 0.5, 0.5]))  # outside entirely


def test_l_shape_end_to_end_intervals():
    """parse_bbox_xml emits one primitive per convex piece; a ray through
    the concavity must MISS all of them, a ray through the L must hit."""
    import os
    import xml.etree.ElementTree as ET

    from panopticnerf_tpu.data.annotation3d import parse_bbox_xml

    def _mat(parent, name, arr):
        node = ET.SubElement(parent, name)
        ET.SubElement(node, "rows").text = str(arr.shape[0])
        ET.SubElement(node, "cols").text = str(arr.shape[1])
        ET.SubElement(node, "data").text = " ".join(f"{v:.8f}" for v in arr.reshape(-1))

    root = ET.Element("opencv_storage")
    obj = ET.SubElement(root, "object_0")
    T = np.eye(4)
    T[:3, 3] = [0.0, 0.0, 5.0]
    _mat(obj, "transform", T)
    _mat(obj, "vertices", _l_shape_verts())
    ET.SubElement(obj, "label").text = "building"
    ET.SubElement(obj, "semanticId").text = "11"
    ET.SubElement(obj, "instanceId").text = "7"
    ET.SubElement(obj, "index").text = "3"

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "seq.xml")
        ET.ElementTree(root).write(path)
        boxes = parse_bbox_xml(path, max_cut_planes=8)

    assert len(boxes) >= 2  # concave -> multiple convex pieces
    assert all(b.instance_id == 11 * 1000 + 7 for b in boxes)
    assert all(b.index == 3 and b.ordinal == 0 for b in boxes)

    P = len(boxes)
    w2p = np.stack([b.world_to_prim for b in boxes])
    F = 8
    allpass = np.zeros((F, 4), np.float32)
    allpass[:, 3] = 1.0
    planes = np.stack(
        [b.cut_planes if b.cut_planes is not None else allpass for b in boxes]
    )
    prims = Primitives(
        world_to_prim=jnp.asarray(w2p),
        semantic=jnp.asarray([b.semantic_id for b in boxes]),
        instance=jnp.asarray([b.instance_id for b in boxes]),
        valid=jnp.ones(P, bool),
        cut_planes=jnp.asarray(planes),
    )
    # rays along +z (the extrusion sits at z in [5, 6], footprint in x,y)
    o = np.array(
        [
            [0.5, 0.5, 0.0],   # through the thick part -> hit
            [1.5, 0.5, 0.0],   # bottom arm -> hit
            [0.5, 1.5, 0.0],   # left arm -> hit
            [1.5, 1.5, 0.0],   # the concavity -> MISS (hull over-covered)
            [2.5, 2.5, 0.0],   # outside -> miss
        ],
        np.float32,
    )
    d_ = np.tile(np.array([[0, 0, 1]], np.float32), (5, 1))
    t_in, t_out, hit = map(
        np.asarray, ray_box_intervals(jnp.asarray(o), jnp.asarray(d_), prims, 0.01, 50.0)
    )
    any_hit = hit.any(1)
    assert any_hit.tolist() == [True, True, True, False, False]
    # hit intervals are exactly the slab [5, 6]
    for r in range(3):
        k = np.argmax(hit[r])
        assert abs(t_in[r, k] - 5.0) < 1e-4 and abs(t_out[r, k] - 6.0) < 1e-4
