"""Sharded full-image rendering: tiles spread across the data mesh.

`render_image_rays` (render/renderer.py) lax.maps ray tiles on one device.
For eval/visualization on a slice, this variant processes `n_dev` tiles per
map step — the flattened ray axis of each step is shard-constrained along
the mesh, so every device renders one tile concurrently and XLA keeps the
params replicated (no collectives in the loop body at all).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.ops.intersect import RayIntervals
from panopticnerf_tpu.render.renderer import RenderOut, eval_render_cfg, render_rays


def render_image_rays_sharded(
    model, params, rays_o, rays_d, bounds, cfg: Config, mesh: Mesh,
    iv: Optional[RayIntervals] = None,
):
    """Same contract as render_image_rays, with tiles sharded over `mesh`."""
    cfg = eval_render_cfg(cfg)
    axis = cfg.parallel.mesh_axis_name
    n_dev = mesh.devices.size
    tile = cfg.render.ray_tile
    span = tile * n_dev                      # rays per map step (sharded)
    n = rays_o.shape[0]
    n_pad = (-n) % span

    def pad(a):
        if n_pad == 0:
            return a
        return jnp.concatenate([a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)], 0)

    def tiles(a):
        t = pad(a).reshape(-1, span, *a.shape[1:])
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, P(None, axis, *([None] * (a.ndim - 1))))
        )

    ro_t, rd_t = tiles(rays_o), tiles(rays_d)
    iv_t = RayIntervals(*[tiles(x) for x in iv]) if iv is not None else None

    def one(args):
        if iv is not None:
            o, d, ivx = args
        else:
            o, d = args
            ivx = None
        out = render_rays(model, params, o, d, bounds, jax.random.key(0), cfg,
                          iv=ivx, train=False)
        return out._replace(coarse=None, z=None, weights=None,
                            sample_sem_logits=None, sample_inside_k=None,
                            sample_cnt=None)

    args = (ro_t, rd_t, iv_t) if iv is not None else (ro_t, rd_t)
    outs = lax.map(one, args)
    # Multi-host only: replicate the final maps (a small all-gather per
    # frame) so every HOST can np.asarray them for metric/file work.
    # Single-host runs skip it — all shards are already addressable.
    rep = NamedSharding(mesh, P()) if jax.process_count() > 1 else None

    def unpad(a):
        a = a.reshape(-1, *a.shape[2:])[:n]
        return a if rep is None else lax.with_sharding_constraint(a, rep)

    return RenderOut(*[unpad(x) if isinstance(x, jnp.ndarray) else None for x in outs])
