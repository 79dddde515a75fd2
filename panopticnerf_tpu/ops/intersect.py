"""Ray / 3D-bounding-primitive interval intersection — fixed shapes for TPU.

This replaces the reference's ragged CPU-numpy intersection in the dataset
worker ([pn] lib/datasets/kitti360/panopticnerf.py, unverified — SURVEY.md
§3.1, flagged there as the CPU bottleneck). TPU redesign (SURVEY.md §7
stage 3): primitives are a padded struct-of-arrays; intersection runs on
device inside the jitted step as a dense (rays x primitives) slab test, then
a top-K (nearest-entry) selection yields per-ray fixed-K intervals carrying
(semantic, instance) ids. Misses are encoded as t_in = +BIG with mask 0 —
all downstream ops are mask-aware, never shape-dependent.

Primitive representation: every KITTI-360 bounding primitive is an affine
map `world_to_prim` (3, 4) taking world points into the primitive's local
frame where the primitive is the unit cube [-1, 1]^3. Extruded polygons
arrive as the convex pieces of their exact decomposition
(data/annotation3d.py), each an OBB optionally refined by `cut_planes`
half-spaces — so concave annotations intersect exactly, not as a box
approximation (see Primitives below).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

BIG = 1e9


class Primitives(NamedTuple):
    """Padded per-frame primitive set (all arrays share leading dim P).

    `cut_planes` (optional) refines non-cuboid primitives: F half-spaces
    n.x <= b in the LOCAL unit-cube frame, intersected with the OBB slab
    range. Cuboids (or padding) use all-pass planes (n = 0, b = 1). This
    gives exact intervals for convex extruded polygons — the reference's
    CPU path intersects polygon meshes exactly; the OBB alone is only the
    template bounding box.
    """

    world_to_prim: jnp.ndarray  # (P, 3, 4) world -> unit-cube local frame
    semantic: jnp.ndarray       # (P,) int32 class id (taxonomy per config)
    instance: jnp.ndarray       # (P,) int32 instance id (0 = none/stuff)
    valid: jnp.ndarray          # (P,) bool padding mask
    cut_planes: jnp.ndarray | None = None  # (P, F, 4) [nx ny nz b], local frame


class RayIntervals(NamedTuple):
    """Per-ray top-K entry-sorted intersection intervals."""

    t_in: jnp.ndarray     # (N, K) entry distance (BIG where invalid)
    t_out: jnp.ndarray    # (N, K) exit distance  (BIG where invalid)
    semantic: jnp.ndarray  # (N, K) int32
    instance: jnp.ndarray  # (N, K) int32
    mask: jnp.ndarray     # (N, K) bool


def make_box_primitives(
    centers: jnp.ndarray,
    sizes: jnp.ndarray,
    rotations: jnp.ndarray,
    semantics: jnp.ndarray,
    instances: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> Primitives:
    """Build the world->unit-cube affines for oriented boxes.

    centers (P, 3), sizes (P, 3) full extents, rotations (P, 3, 3)
    local->world. x_local = diag(2/size) @ R^T @ (x - center).
    """
    inv_half = 2.0 / jnp.maximum(sizes, 1e-9)                  # (P, 3)
    Rt = jnp.swapaxes(rotations, -1, -2)                       # (P, 3, 3)
    lin = inv_half[:, :, None] * Rt                            # (P, 3, 3)
    trans = -jnp.einsum("pij,pj->pi", lin, centers)            # (P, 3)
    A = jnp.concatenate([lin, trans[:, :, None]], axis=-1)     # (P, 3, 4)
    if valid is None:
        valid = jnp.ones(centers.shape[0], dtype=bool)
    return Primitives(
        world_to_prim=A,
        semantic=semantics.astype(jnp.int32),
        instance=instances.astype(jnp.int32),
        valid=valid,
    )


def ray_box_intervals(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    prims: Primitives,
    near: float,
    far: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense slab test of N rays against P unit-cube primitives.

    Returns (t_in, t_out, hit) each (N, P); t clipped to [near, far];
    misses get t_in = t_out = BIG.
    """
    A = prims.world_to_prim                                   # (P, 3, 4)
    R = A[:, :, :3]                                            # (P, 3, 3)
    t = A[:, :, 3]                                             # (P, 3)
    # Local-frame origins/dirs for every (ray, prim) pair.
    o_l = jnp.einsum("pij,nj->npi", R, rays_o) + t[None]       # (N, P, 3)
    d_l = jnp.einsum("pij,nj->npi", R, rays_d)                 # (N, P, 3)
    # Slab test vs [-1, 1]^3 with divide-safe handling of axis-parallel rays.
    safe_d = jnp.where(jnp.abs(d_l) < 1e-9, jnp.where(d_l >= 0, 1e-9, -1e-9), d_l)
    inv_d = 1.0 / safe_d
    t1 = (-1.0 - o_l) * inv_d
    t2 = (1.0 - o_l) * inv_d
    # Rays parallel to a slab and outside it never hit: force a miss there.
    parallel_outside = (jnp.abs(d_l) < 1e-9) & (jnp.abs(o_l) > 1.0)
    t_lo = jnp.where(parallel_outside, BIG, jnp.minimum(t1, t2))
    t_hi = jnp.where(parallel_outside, -BIG, jnp.maximum(t1, t2))
    t_in = jnp.max(t_lo, axis=-1)                              # (N, P)
    t_out = jnp.min(t_hi, axis=-1)

    if prims.cut_planes is not None:
        # Convex refinement in the local frame: for plane n.x <= b and ray
        # x(t) = o_l + t d_l, the constraint is a*t <= c with a = n.d_l,
        # c = b - n.o_l: a > 0 caps t_out, a < 0 raises t_in, a ~ 0 is a
        # hard miss when c < 0.
        n = prims.cut_planes[..., :3]                          # (P, F, 3)
        b = prims.cut_planes[..., 3]                           # (P, F)
        a = jnp.einsum("pfi,npi->npf", n, d_l)                 # (N, P, F)
        c = b[None] - jnp.einsum("pfi,npi->npf", n, o_l)       # (N, P, F)
        eps = 1e-9
        entering = a < -eps
        leaving = a > eps
        safe_a = jnp.where(jnp.abs(a) < eps, eps, a)
        t_plane = c / safe_a
        t_in = jnp.maximum(t_in, jnp.max(jnp.where(entering, t_plane, -BIG), -1))
        t_out = jnp.minimum(t_out, jnp.min(jnp.where(leaving, t_plane, BIG), -1))
        miss = jnp.any((jnp.abs(a) <= eps) & (c < 0), axis=-1)
        t_out = jnp.where(miss, -BIG, t_out)

    t_in = jnp.maximum(t_in, near)
    t_out = jnp.minimum(t_out, far)
    hit = (t_out > t_in) & prims.valid[None, :]
    t_in = jnp.where(hit, t_in, BIG)
    t_out = jnp.where(hit, t_out, BIG)
    return t_in, t_out, hit


def top_k_intervals(
    t_in: jnp.ndarray,
    t_out: jnp.ndarray,
    hit: jnp.ndarray,
    prims: Primitives,
    k: int,
) -> RayIntervals:
    """Keep the K nearest-entry intervals per ray (entry-sorted).

    If the frame carries fewer primitives than K, results are padded with
    invalid entries (static shapes either way).
    """
    p = t_in.shape[-1]
    k_eff = min(k, p)
    neg = -t_in                                                # top_k gives largest
    _, idx = lax.top_k(neg, k_eff)                             # (N, k_eff) indices into P
    if k_eff < k:
        # Pad index list with 0s; the hit-mask gather below marks them invalid.
        pad = jnp.zeros(idx.shape[:-1] + (k - k_eff,), idx.dtype)
        idx = jnp.concatenate([idx, pad], axis=-1)
    take = lambda a: jnp.take_along_axis(a, idx, axis=-1)
    sel_in = take(t_in)
    sel_out = take(t_out)
    sel_hit = take(hit)
    if k_eff < k:
        col = jnp.arange(k) < k_eff                            # (K,) static
        sel_hit = sel_hit & col[None, :]
    sem = prims.semantic[idx]
    inst = prims.instance[idx]
    return RayIntervals(
        t_in=jnp.where(sel_hit, sel_in, BIG),
        t_out=jnp.where(sel_hit, sel_out, BIG),
        semantic=jnp.where(sel_hit, sem, -1),
        instance=jnp.where(sel_hit, inst, -1),
        mask=sel_hit,
    )


def intersect_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    prims: Primitives,
    near: float,
    far: float,
    k: int,
) -> RayIntervals:
    """Full pipeline: dense slab test -> per-ray top-K entry-sorted intervals."""
    t_in, t_out, hit = ray_box_intervals(rays_o, rays_d, prims, near, far)
    return top_k_intervals(t_in, t_out, hit, prims, k)


def intersect_rays_per_ray(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    prims: Primitives,
    near: float,
    far: float,
    k: int,
) -> RayIntervals:
    """Like `intersect_rays`, but with per-ray primitive sets.

    prims arrays carry a leading ray dim: world_to_prim (N, P, 3, 4),
    semantic/instance/valid (N, P). Used by the train step where each ray's
    batch row was gathered from its source frame's visible-primitive set.
    vmap over the shared-prims kernel keeps one code path.
    """
    if prims.cut_planes is not None:
        one = lambda o, d, A, s, i, v, cp: ray_box_intervals(
            o[None], d[None], Primitives(A, s, i, v, cp), near, far
        )
        t_in, t_out, hit = jax.vmap(one)(
            rays_o, rays_d, prims.world_to_prim, prims.semantic,
            prims.instance, prims.valid, prims.cut_planes,
        )
    else:
        one = lambda o, d, A, s, i, v: ray_box_intervals(
            o[None], d[None], Primitives(A, s, i, v), near, far
        )
        t_in, t_out, hit = jax.vmap(one)(
            rays_o, rays_d, prims.world_to_prim, prims.semantic,
            prims.instance, prims.valid,
        )  # each (N, 1, P)
    t_in, t_out, hit = t_in[:, 0], t_out[:, 0], hit[:, 0]
    # Inline top-k with per-ray label tables.
    p = t_in.shape[-1]
    k_eff = min(k, p)
    _, idx = lax.top_k(-t_in, k_eff)
    if k_eff < k:
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (k - k_eff,), idx.dtype)], axis=-1
        )
    take = lambda a: jnp.take_along_axis(a, idx, axis=-1)
    sel_in, sel_out, sel_hit = take(t_in), take(t_out), take(hit)
    if k_eff < k:
        sel_hit = sel_hit & (jnp.arange(k) < k_eff)[None, :]
    sem = take(prims.semantic)
    inst = take(prims.instance)
    return RayIntervals(
        t_in=jnp.where(sel_hit, sel_in, BIG),
        t_out=jnp.where(sel_hit, sel_out, BIG),
        semantic=jnp.where(sel_hit, sem, -1),
        instance=jnp.where(sel_hit, inst, -1),
        mask=sel_hit,
    )


def samples_in_intervals(z: jnp.ndarray, iv: RayIntervals) -> jnp.ndarray:
    """Per-sample containment vs each kept interval.

    z: (N, S) sample distances. Returns bool (N, S, K): sample s of ray n lies
    inside interval k. This recovers per-sample (semantic, instance)
    provenance after the merged sort in the guided sampler, and feeds the
    fixed semantic field + 3D loss.
    """
    z_ = z[..., None]                                          # (N, S, 1)
    return (z_ >= iv.t_in[:, None, :]) & (z_ <= iv.t_out[:, None, :]) & iv.mask[:, None, :]


def labeled_containment(z: jnp.ndarray, iv: RayIntervals):
    """Containment against *labeled* intervals only.

    Intervals with semantic < 0 (untrainable classes, e.g. trainId-ignored
    primitives) still guide sampling/instances but carry no label mass.

    Returns (inside_lab (N, S, K) bool, cnt (N, S) f32 labeled-prims-per-
    sample). The fixed field never needs a dense (N, S, C) tensor: its
    per-sample distribution is the uniform mixture over the cnt containing
    labels, so every consumer reduces over K instead (see
    `fixed_map_from_weights` and the 3D loss in train/loss.py).
    """
    inside = samples_in_intervals(z, iv)                       # (N, S, K)
    labeled = iv.mask & (iv.semantic >= 0)                     # (N, K)
    inside_lab = inside & labeled[:, None, :]
    cnt = jnp.sum(inside_lab, axis=-1).astype(jnp.float32)     # (N, S)
    return inside_lab, cnt


def fixed_map_from_weights(
    weights: jnp.ndarray,       # (N, S) compositing weights
    inside_lab: jnp.ndarray,    # (N, S, K)
    cnt: jnp.ndarray,           # (N, S)
    iv: RayIntervals,
    num_classes: int,
) -> jnp.ndarray:
    """Composited fixed-field map (N, C) without per-sample (N, S, C).

    fixed_map[c] = sum_s w_s * dist_s[c] with dist_s the uniform mixture over
    containing labels == sum_k onehot(sem_k)[c] * sum_s w_s inside_sk / cnt_s.
    """
    inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)                      # (N, S)
    m = jnp.sum((weights * inv_cnt)[..., None] * inside_lab.astype(weights.dtype),
                axis=1)                                        # (N, K)
    sem = jnp.clip(iv.semantic, 0, num_classes - 1)
    onehot = jnp.where(
        (iv.mask & (iv.semantic >= 0))[..., None],
        jnp.eye(num_classes, dtype=weights.dtype)[sem],
        0.0,
    )                                                          # (N, K, C)
    return jnp.sum(m[..., None] * onehot, axis=1)              # (N, C)


def fixed_semantic_distribution(
    z: jnp.ndarray, iv: RayIntervals, num_classes: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense per-sample fixed field (N, S, C) — reference semantics, used by
    tests and external callers; the hot path uses the K-factored ops above.
    """
    inside_lab, cnt = labeled_containment(z, iv)
    sem = jnp.clip(iv.semantic, 0, num_classes - 1)            # (N, K)
    onehot = jnp.where(
        (iv.mask & (iv.semantic >= 0))[..., None],
        jnp.eye(num_classes, dtype=jnp.float32)[sem],
        0.0,
    )                                                          # (N, K, C)
    counts = jnp.sum(inside_lab[..., None].astype(jnp.float32) * onehot[:, None], axis=2)
    dist = counts / jnp.maximum(cnt[..., None], 1.0)
    return dist, cnt > 0
