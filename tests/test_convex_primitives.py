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
