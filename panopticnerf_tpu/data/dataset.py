"""Device-resident dataset container + on-device ray batch sampling.

The reference streams batches from torch DataLoader worker processes that do
per-ray numpy work ([pn] lib/datasets/..., SURVEY.md §3.1 marks this as the
CPU bottleneck + a per-step H2D copy). TPU redesign: the whole (sub)sequence
— images, poses, pseudo-labels, depth, padded per-view primitive sets — is
uploaded to HBM once; every train step draws (view, pixel) indices from the
PRNG and gathers its batch *inside the jitted step*. Zero per-step host work,
zero H2D traffic.

Memory check (flagship config): 64 stereo frames at 376x1408 = 128 views;
rgb f32 ~ 814 MB (or uint8 203 MB), pseudo+depth ~ 540 MB — fits a 16 GB v5e
chip beside the ~1M-param model. Larger runs shard views across the data
axis or keep images in uint8 (we store uint8 and normalize on gather).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.ops.intersect import (
    Primitives,
    RayIntervals,
    intersect_rays,
    intersect_rays_per_ray,
)
from panopticnerf_tpu.ops.rays import FisheyeParams, gen_rays_perspective, pixel_dirs_fisheye


class DeviceDataset(NamedTuple):
    """All-views tensor pack. V = number of views (frames x cameras)."""

    images: jnp.ndarray        # (V, H, W, 3) uint8
    K: jnp.ndarray             # (V, 3, 3) float32 intrinsics per view
    c2w: jnp.ndarray           # (V, 3, 4) float32 camera-to-world
    pseudo: jnp.ndarray        # (V, H, W) int32 semantic pseudo-labels (255 = ignore)
    depth: jnp.ndarray         # (V, H, W) float32 sparse depth as RAY
                               # DISTANCE in meters (<=0 invalid) — loaders
                               # convert plane-z sources (SGM) at load time;
                               # matches the composited depth convention.
    prim_w2p: jnp.ndarray      # (V, P, 3, 4) per-view visible primitives
    prim_sem: jnp.ndarray      # (V, P) int32
    prim_inst: jnp.ndarray     # (V, P) int32
    prim_valid: jnp.ndarray    # (V, P) bool
    bounds_center: jnp.ndarray  # (3,)
    bounds_scale: jnp.ndarray   # ()
    gt_sem: Optional[jnp.ndarray] = None   # (V, H, W) int32 eval GT (255 ignore)
    gt_inst: Optional[jnp.ndarray] = None  # (V, H, W) int32 eval GT instances
    # Convex cut planes for extruded-polygon primitives (None = OBB only):
    prim_planes: Optional[jnp.ndarray] = None  # (V, P, F, 4) local half-spaces
    # -360 extensions (None for perspective-only datasets):
    cam_model: Optional[jnp.ndarray] = None  # (V,) int32: 0 = perspective, 1 = MEI fisheye
    fisheye: Optional[jnp.ndarray] = None    # (V, 7) [gamma1 gamma2 u0 v0 xi k1 k2]
    valid_mask: Optional[jnp.ndarray] = None  # (V, H, W) bool (fisheye image circle)


class RayBatch(NamedTuple):
    rays_o: jnp.ndarray    # (N, 3)
    rays_d: jnp.ndarray    # (N, 3)
    rgb: jnp.ndarray       # (N, 3) float32 in [0, 1]
    pseudo: jnp.ndarray    # (N,) int32
    depth: jnp.ndarray     # (N,) float32
    view: jnp.ndarray      # (N,) int32 source view index
    valid: jnp.ndarray     # (N,) bool (inside fisheye image circle etc.)


def sample_ray_batch(
    key: jax.Array,
    ds: DeviceDataset,
    view_ids: jnp.ndarray,
    n_rays: int,
    views_per_batch: int = 0,
) -> RayBatch:
    """Draw a random ray batch fully on device.

    view_ids: (T,) int32 pool of views to sample from (the train split).
    views_per_batch: 0 = every ray draws its view independently (fully
    mixed); G > 0 = rays come from G views in contiguous groups of
    n_rays // G (the reference samples ONE frame per iteration, G=1) —
    grouped batches let the intersection path gather per GROUP instead of
    per ray (see batch_intervals).
    """
    h, w = ds.images.shape[1:3]
    k1, k2, k3 = jax.random.split(key, 3)
    if views_per_batch > 0:
        g = views_per_batch
        group = view_ids[jax.random.randint(k1, (g,), 0, view_ids.shape[0])]
        vi = jnp.repeat(group, n_rays // g, total_repeat_length=n_rays)
    else:
        vi = view_ids[jax.random.randint(k1, (n_rays,), 0, view_ids.shape[0])]
    u = jax.random.randint(k2, (n_rays,), 0, w)
    v = jax.random.randint(k3, (n_rays,), 0, h)

    rgb = ds.images[vi, v, u].astype(jnp.float32) / 255.0
    pseudo = ds.pseudo[vi, v, u]
    depth = ds.depth[vi, v, u]
    valid = ds.valid_mask[vi, v, u] if ds.valid_mask is not None else jnp.ones(n_rays, bool)

    uv = jnp.stack([u, v], axis=-1).astype(jnp.float32) + 0.5
    c2w = ds.c2w[vi]                                           # (N, 3, 4)
    dirs_cam = _pixel_dirs(ds, vi, uv)
    # mul-reduce, not einsum("nij,nj->ni") — the latter lowers to N tiny
    # batched 3x3 MXU matmuls on this platform (CLAUDE.md perf notes).
    d = jnp.sum(c2w[:, :, :3] * dirs_cam[:, None, :], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = c2w[:, :, 3]
    return RayBatch(rays_o=o, rays_d=d, rgb=rgb, pseudo=pseudo, depth=depth,
                    view=vi, valid=valid)


def _pixel_dirs(ds: DeviceDataset, vi: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Per-ray camera-frame directions with branch-free camera-model select.

    vi: (N,) view indices; uv: (N, 2). Perspective uses ds.K[vi]; fisheye
    (cam_model == 1) uses the MEI unprojection with per-ray parameters.
    """
    K = ds.K[vi]                                               # (N, 3, 3)
    x = (uv[:, 0] - K[:, 0, 2]) / K[:, 0, 0]
    y = (uv[:, 1] - K[:, 1, 2]) / K[:, 1, 1]
    persp = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    if ds.cam_model is None:
        return persp
    fp = ds.fisheye[vi]                                        # (N, 7)
    fe = pixel_dirs_fisheye(
        uv, FisheyeParams(fp[:, 0], fp[:, 1], fp[:, 2], fp[:, 3], fp[:, 4], fp[:, 5], fp[:, 6])
    )
    is_fe = (ds.cam_model[vi] == 1)[:, None]
    return jnp.where(is_fe, fe, persp)


def batch_intervals(
    ds: DeviceDataset, batch: RayBatch, near: float, far: float, k: int,
    views_per_batch: int = 0, use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Intersect a ray batch against each ray's source-view primitive set.

    Grouped batches (views_per_batch = G > 0, see sample_ray_batch) gather
    primitive tables once per GROUP of n//G rays instead of once per ray —
    G small gathers + a vmap over G replaces N large gathers. With
    `use_pallas`, the grouped path runs the fused slab+top-K kernel
    (ops.pallas_intersect, cut planes handled in-kernel).
    """
    if views_per_batch > 0:
        g = views_per_batch
        n = batch.rays_o.shape[0]
        gv = batch.view.reshape(g, n // g)[:, 0]               # (G,) group views
        ro = batch.rays_o.reshape(g, n // g, 3)
        rd = batch.rays_d.reshape(g, n // g, 3)
        planes = ds.prim_planes[gv] if ds.prim_planes is not None else None
        gprims = Primitives(
            world_to_prim=ds.prim_w2p[gv], semantic=ds.prim_sem[gv],
            instance=ds.prim_inst[gv], valid=ds.prim_valid[gv],
            cut_planes=planes,
        )
        if use_pallas:
            from panopticnerf_tpu.ops.pallas_intersect import intersect_groups_pallas

            iv = intersect_groups_pallas(ro, rd, gprims, near, far, k,
                                         interpret=pallas_interpret)
        elif planes is not None:
            iv = jax.vmap(
                lambda o, d, A, s, i, v, cp: intersect_rays(
                    o, d, Primitives(A, s, i, v, cp), near, far, k
                )
            )(ro, rd, gprims.world_to_prim, gprims.semantic, gprims.instance,
              gprims.valid, planes)
        else:
            iv = jax.vmap(
                lambda o, d, A, s, i, v: intersect_rays(
                    o, d, Primitives(A, s, i, v), near, far, k
                )
            )(ro, rd, gprims.world_to_prim, gprims.semantic, gprims.instance,
              gprims.valid)
        return RayIntervals(*[x.reshape(n, *x.shape[2:]) for x in iv])
    prims = Primitives(
        world_to_prim=ds.prim_w2p[batch.view],
        semantic=ds.prim_sem[batch.view],
        instance=ds.prim_inst[batch.view],
        valid=ds.prim_valid[batch.view],
        cut_planes=ds.prim_planes[batch.view] if ds.prim_planes is not None else None,
    )
    return intersect_rays_per_ray(batch.rays_o, batch.rays_d, prims, near, far, k)


def view_rays(ds: DeviceDataset, view: int):
    """All rays of one view (handles both camera models; view may be traced)."""
    h, w = ds.images.shape[1:3]
    vv, uu = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(jnp.float32) + 0.5
    if ds.cam_model is None:
        return gen_rays_perspective(uv, ds.K[view], ds.c2w[view])
    vi = jnp.full((uv.shape[0],), view, jnp.int32)
    dirs_cam = _pixel_dirs(ds, vi, uv)
    c2w = ds.c2w[view]
    d = jnp.einsum("ij,nj->ni", c2w[:, :3], dirs_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(c2w[:, 3], d.shape)
    return o, d


def view_primitives(ds: DeviceDataset, view: int) -> Primitives:
    return Primitives(
        world_to_prim=ds.prim_w2p[view],
        semantic=ds.prim_sem[view],
        instance=ds.prim_inst[view],
        valid=ds.prim_valid[view],
        cut_planes=ds.prim_planes[view] if ds.prim_planes is not None else None,
    )


def _planes_f(parts):
    for d in parts:
        if d.prim_planes is not None:
            return d.prim_planes.shape[2]
    return 1


def concat_datasets(parts: list[DeviceDataset]) -> DeviceDataset:
    """Concatenate datasets along the view axis (multi-sequence training,
    BASELINE config 5). Optional fields are materialized with neutral values
    when any part carries them (mixed perspective/fisheye sequences OK).
    All parts must share (H, W) and primitive padding P."""
    assert parts
    if len(parts) == 1:
        return parts[0]
    h, w = parts[0].images.shape[1:3]
    p = parts[0].prim_w2p.shape[1]
    for d in parts[1:]:
        if d.images.shape[1:3] != (h, w) or d.prim_w2p.shape[1] != p:
            raise ValueError("all sequences must share image size and max_primitives")

    def cat(field, default_fn=None):
        vals = [getattr(d, field) for d in parts]
        if all(v is None for v in vals):
            return None
        if any(v is None for v in vals):
            if default_fn is None:
                raise ValueError(f"mixed None/non-None for {field}")
            vals = [
                v if v is not None else default_fn(d)
                for v, d in zip(vals, parts)
            ]
        return jnp.concatenate(vals, axis=0)

    n_views = lambda d: d.images.shape[0]
    centers = jnp.stack([d.bounds_center for d in parts])
    # shared normalization: envelope of the per-sequence bounds
    center = centers.mean(0)
    radii = jnp.stack(
        [1.0 / d.bounds_scale + jnp.linalg.norm(d.bounds_center - center) for d in parts]
    )
    scale = 1.0 / radii.max()

    return DeviceDataset(
        images=cat("images"),
        K=cat("K"),
        c2w=cat("c2w"),
        pseudo=cat("pseudo"),
        depth=cat("depth"),
        prim_w2p=cat("prim_w2p"),
        prim_sem=cat("prim_sem"),
        prim_inst=cat("prim_inst"),
        prim_valid=cat("prim_valid"),
        bounds_center=center,
        bounds_scale=scale,
        prim_planes=cat(
            "prim_planes",
            lambda d: jnp.tile(
                jnp.asarray([0, 0, 0, 1], jnp.float32),
                (n_views(d), p, _planes_f(parts), 1),
            ),
        ) if any(d.prim_planes is not None for d in parts) else None,
        gt_sem=cat("gt_sem", lambda d: jnp.full((n_views(d), h, w), 255, jnp.int32)),
        gt_inst=cat("gt_inst", lambda d: jnp.zeros((n_views(d), h, w), jnp.int32)),
        cam_model=cat("cam_model", lambda d: jnp.zeros((n_views(d),), jnp.int32)),
        fisheye=cat(
            "fisheye",
            lambda d: jnp.tile(jnp.asarray([1, 1, 0, 0, 0, 0, 0], jnp.float32), (n_views(d), 1)),
        ),
        valid_mask=cat("valid_mask", lambda d: jnp.ones((n_views(d), h, w), bool)),
    )


def train_test_split(num_views: int, test_every: int) -> tuple[np.ndarray, np.ndarray]:
    """Reference-style held-out split: every `test_every`-th view is test."""
    ids = np.arange(num_views)
    test = ids[ids % test_every == test_every // 2] if test_every > 0 else ids[:0]
    train = np.setdiff1d(ids, test)
    return train, test
