"""Batched ray generation for perspective and fisheye cameras.

Reference: CPU-numpy `get_rays`-style helpers inside the dataset
([pn] lib/datasets/kitti360/panopticnerf.py + lib/utils/data_utils.py,
unverified — SURVEY.md §3.1). Here ray generation is pure jnp running
*inside* the jitted train/render step: the host pipeline ships only pixel
indices + camera parameters; origins/directions are computed on device.

Conventions: OpenCV camera (x right, y down, z forward). `c2w` is (3, 4)
camera-to-world. Intrinsics K are (3, 3) for rectified perspective frames
(KITTI-360 P_rect_00's left 3x3).

Fisheye (PanopticNeRF-360): KITTI-360 uses the MEI unified camera model
(mirror parameter xi + radial/tangential distortion) for image_02/03
(calibration/image_0{2,3}.yaml). Unprojection solves the model analytically
for the unit sphere point, then undistorts iteratively with a fixed,
jit-friendly iteration count (lax-unrolled fori loop, static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FisheyeParams(NamedTuple):
    """MEI unified camera model parameters (KITTI-360 fisheye yaml)."""

    gamma1: jnp.ndarray  # focal-like x
    gamma2: jnp.ndarray  # focal-like y
    u0: jnp.ndarray
    v0: jnp.ndarray
    xi: jnp.ndarray      # mirror parameter
    k1: jnp.ndarray      # radial distortion
    k2: jnp.ndarray


def pixel_dirs_perspective(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame ray directions through pixel centers.

    uv: (..., 2) pixel coordinates (u = col, v = row), pixel-center convention
        (pass u + 0.5 style offsets upstream if desired; reference samples
        integer pixel grids).
    K: (3, 3).
    Returns (..., 3) un-normalized camera-frame directions.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def _undistort_fisheye(xd: jnp.ndarray, yd: jnp.ndarray, p: FisheyeParams, iters: int = 8):
    """Invert the radial distortion x_d = x (1 + k1 r^2 + k2 r^4) by fixed-point
    iteration with a static iteration count (jit/TPU friendly)."""

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        scale = 1.0 + p.k1 * r2 + p.k2 * r2 * r2
        return (xd / scale, yd / scale)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return x, y


def pixel_dirs_fisheye(uv: jnp.ndarray, p: FisheyeParams, iters: int = 8) -> jnp.ndarray:
    """Unproject MEI-model fisheye pixels to camera-frame unit directions.

    Forward model: X on unit sphere; (x, y) = (X_x, X_y) / (X_z + xi);
    distortion; then u = gamma1 * x_d + u0. Inversion: normalize, undistort,
    then solve for the sphere point z-component analytically.
    Returns (..., 3) unit directions; invalid (outside-FOV) pixels yield
    non-unit placeholders flagged by callers via the returned mask pattern
    (dirs z may be <= -1 region); KITTI-360 fisheye FOV is ~185 deg.
    """
    xd = (uv[..., 0] - p.u0) / p.gamma1
    yd = (uv[..., 1] - p.v0) / p.gamma2
    x, y = _undistort_fisheye(xd, yd, p, iters)
    # Solve for unit-sphere point: mx = Xx/(Xz+xi), my = Xy/(Xz+xi),
    # with Xx^2+Xy^2+Xz^2 = 1. Let r2 = mx^2+my^2; then
    # Xz = (xi + sqrt(1 + (1 - xi^2) r2)) / (1 + r2) - xi  (standard MEI inverse)
    r2 = x * x + y * y
    xi = p.xi
    disc = jnp.maximum(1.0 + (1.0 - xi * xi) * r2, 0.0)
    factor = (xi + jnp.sqrt(disc)) / (1.0 + r2)
    X = jnp.stack([factor * x, factor * y, factor - xi], axis=-1)
    return X / jnp.linalg.norm(X, axis=-1, keepdims=True)


def rays_from_dirs(dirs_cam: jnp.ndarray, c2w: jnp.ndarray):
    """Rotate camera-frame dirs to world and broadcast origins.

    dirs_cam: (..., 3); c2w: (..., 3, 4) broadcastable against dirs batch.
    Returns (rays_o, rays_d) world-frame; rays_d normalized.
    """
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    # broadcast-multiply-reduce, NOT einsum: with a per-ray batched R this
    # would lower to N tiny 3x3 matmuls (see CLAUDE.md perf notes).
    d = jnp.sum(R * dirs_cam[..., None, :], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(t, d.shape)
    return o, d


def gen_rays_perspective(uv: jnp.ndarray, K: jnp.ndarray, c2w: jnp.ndarray):
    """uv (..., 2), K (3,3), c2w (...,3,4) -> world rays (o, d)."""
    return rays_from_dirs(pixel_dirs_perspective(uv, K), c2w)


def gen_rays_fisheye(uv: jnp.ndarray, p: FisheyeParams, c2w: jnp.ndarray):
    return rays_from_dirs(pixel_dirs_fisheye(uv, p), c2w)


def full_image_uv(h: int, w: int) -> jnp.ndarray:
    """(H*W, 2) float uv grid in row-major order (matches image flatten)."""
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
