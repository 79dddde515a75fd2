"""Equirectangular panorama rendering — PanopticNeRF-360's 360° label transfer.

The -360 branch renders panoramic label/appearance maps around ego positions
([pn360], unverified — SURVEY.md §2.2 '-360 additions'). Rays for an
equirect (H, W) grid: azimuth theta in [-pi, pi) left-to-right, elevation
phi in [-pi/2, pi/2] top-to-bottom, OpenCV-style y-down camera convention.
Rendering reuses the tiled full-image path (one jit, lax.map over tiles).
"""

from __future__ import annotations

import jax.numpy as jnp

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.ops.intersect import intersect_rays
from panopticnerf_tpu.render.renderer import SceneBounds, render_image_rays


def panorama_rays(position: jnp.ndarray, rotation: jnp.ndarray, h: int, w: int):
    """position (3,), rotation (3,3) camera->world. Returns ((HW,3), (HW,3))."""
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    theta = ((u.reshape(-1) + 0.5) / w) * 2 * jnp.pi - jnp.pi
    phi = ((v.reshape(-1) + 0.5) / h) * jnp.pi - jnp.pi / 2
    # y-down camera frame: up is -y; phi > 0 looks down.
    d_cam = jnp.stack(
        [jnp.cos(phi) * jnp.sin(theta), jnp.sin(phi), jnp.cos(phi) * jnp.cos(theta)],
        axis=-1,
    )
    d = d_cam @ rotation.T
    o = jnp.broadcast_to(position, d.shape)
    return o, d


def render_panorama(model, params, ds, view: int, hw: tuple[int, int], cfg: Config):
    """Render an equirect panorama from view's camera center + orientation."""
    h, w = hw
    c2w = ds.c2w[view]
    o, d = panorama_rays(c2w[:, 3], c2w[:, :3], h, w)
    iv = None
    if cfg.render.use_primitives:
        from panopticnerf_tpu.data.dataset import view_primitives

        prims = view_primitives(ds, view)
        iv = intersect_rays(o, d, prims, cfg.render.near, cfg.render.far,
                            cfg.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)
    return render_image_rays(model, params, o, d, bounds, cfg, iv=iv)
