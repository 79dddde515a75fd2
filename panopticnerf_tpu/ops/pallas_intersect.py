"""Pallas TPU kernel: fused ray/OBB slab test + top-K interval selection.

Prototype for ROADMAP item 3 (opt-in; the default path is the XLA version in
ops/intersect.py). One kernel pass produces the per-ray K nearest-entry
intervals, replacing the XLA chain slab -> lax.top_k -> 5 take_along_axis
gathers. Design notes:

- the primitive table (P x (affine | labels)) lives in VMEM for the whole
  grid; ray tiles stream through.
- top-K runs as K passes of (min, one-hot select) over the (T, P) entry
  matrix — dynamic lane indexing (gather) is avoided entirely, matching the
  measured TPU guidance in CLAUDE.md.
- labels travel as f32 through the one-hot selects and are cast back to
  int32 outside (exact for |id| < 2^24).

Supports the shared-primitive-set path (one prim table for all rays, i.e.
per-view intersection / eval rendering) and — via a (G, M/T) grid — the
grouped train path (see intersect_groups_pallas). Convex cut planes are
folded into the same pass: each primitive row carries up to F half-spaces
[n | b] after its affine+labels, and the slab range is refined in-kernel
exactly as in ops.intersect.ray_box_intervals.

Hardware parity note (v5e, measured round 3): vs the XLA path the kernel
flips ~0.02-0.04% of interval slots whose hit test sits on a float decision
boundary (VPU fma/reciprocal association differs from XLA's lowering; f=0
and f>0 alike). Interpret-mode tests pin exact parity of the algorithm;
on-hardware boundary flips are immaterial to guided sampling (stochastic
sample placement inside intervals) and training quality is unaffected —
eval renders default to the XLA path regardless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from panopticnerf_tpu.ops.intersect import BIG, Primitives, RayIntervals


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cap_tile(tile: int, f: int) -> int:
    """Ray-tile cap for the cut-plane kernel. Mosaic stack-allocates the
    fully unrolled slab+plane+top-K temps per ray tile; measured on v5e
    (P_pad=32, K=12): f=8 planes at tile 256 requests 44.1 MB of scoped
    VMEM against the 16 MB window (f=0 fits). Scoped usage scales with the
    tile, so 64 rays/tile keeps the plane variant ~11 MB with headroom.
    The grid streams more (smaller) tiles — total work is unchanged."""
    return min(tile, 64) if f > 0 else tile


def _intersect_tile(rays, prim, store, *, p: int, k: int, near: float,
                    far: float, f: int = 0):
    """Core slab + top-K math on one ray tile.

    rays (T, 128): [ox oy oz dx dy dz ...pad]; prim (P_pad, 128): rows
    [A(12) | valid | sem | inst | planes(F*4) ...pad]. f = number of cut
    planes per row (0 = OBB only); padding planes are all-pass [0 0 0 1].
    Emits interval slot kk via store(kk, t_in, t_out, sem, inst), each
    value (T,) — the caller owns the output refs (and their leading block
    dims), so the single-table and grouped kernels share this body."""
    t = rays.shape[0]
    o = rays[:, 0:3]                                         # (T, 3)
    d = rays[:, 3:6]

    A = prim[:p, 0:12]                                       # (P, 12) rows of (3,4)
    valid = prim[:p, 12]                                     # (P,) 0/1
    sem = prim[:p, 13]
    inst = prim[:p, 14]

    # local coords per (ray, prim): o_l[t,p,i] = A[p, 4i:4i+3] . o[t] + A[p, 4i+3]
    t_lo = jnp.full((t, p), -BIG, jnp.float32)
    t_hi = jnp.full((t, p), BIG, jnp.float32)
    o_ls, d_ls = [], []
    for i in range(3):
        r0, r1, r2, tr = A[:, 4 * i], A[:, 4 * i + 1], A[:, 4 * i + 2], A[:, 4 * i + 3]
        o_l = (o[:, 0:1] * r0[None] + o[:, 1:2] * r1[None]
               + o[:, 2:3] * r2[None] + tr[None])            # (T, P)
        d_l = (d[:, 0:1] * r0[None] + d[:, 1:2] * r1[None] + d[:, 2:3] * r2[None])
        o_ls.append(o_l)
        d_ls.append(d_l)
        par = jnp.abs(d_l) < 1e-9
        safe = jnp.where(par, jnp.where(d_l >= 0, 1e-9, -1e-9), d_l)
        inv = 1.0 / safe
        t1 = (-1.0 - o_l) * inv
        t2 = (1.0 - o_l) * inv
        par_out = par & (jnp.abs(o_l) > 1.0)
        lo = jnp.where(par_out, BIG, jnp.minimum(t1, t2))
        hi = jnp.where(par_out, -BIG, jnp.maximum(t1, t2))
        t_lo = jnp.maximum(t_lo, lo)
        t_hi = jnp.minimum(t_hi, hi)

    if f > 0:
        # Convex half-space refinement (same math as the XLA path): for
        # plane n.x <= b along x(s) = o_l + s d_l, the constraint a*s <= c
        # with a = n.d_l, c = b - n.o_l caps t_hi (a > 0), raises t_lo
        # (a < 0), or is a hard miss (a ~ 0 and c < 0).
        eps = 1e-9
        for ff in range(f):
            base = 15 + 4 * ff
            n0 = prim[:p, base]
            n1 = prim[:p, base + 1]
            n2 = prim[:p, base + 2]
            b = prim[:p, base + 3]
            a = (n0[None] * d_ls[0] + n1[None] * d_ls[1] + n2[None] * d_ls[2])
            c = b[None] - (n0[None] * o_ls[0] + n1[None] * o_ls[1] + n2[None] * o_ls[2])
            entering = a < -eps
            leaving = a > eps
            safe_a = jnp.where(jnp.abs(a) < eps, eps, a)
            t_plane = c / safe_a
            t_lo = jnp.maximum(t_lo, jnp.where(entering, t_plane, -BIG))
            t_hi = jnp.minimum(t_hi, jnp.where(leaving, t_plane, BIG))
            t_hi = jnp.where((jnp.abs(a) <= eps) & (c < 0), -BIG, t_hi)

    t_in = jnp.maximum(t_lo, near)
    t_out = jnp.minimum(t_hi, far)
    hit = (t_out > t_in) & (valid[None, :] > 0.5)
    work = jnp.where(hit, t_in, BIG)                         # (T, P)
    t_out_m = jnp.where(hit, t_out, BIG)

    iota_p = jax.lax.broadcasted_iota(jnp.int32, (t, p), 1)
    for kk in range(k):
        cur = jnp.min(work, axis=1, keepdims=True)           # (T, 1)
        # first index achieving the min (one-hot, no gather)
        is_min = work <= cur                                  # (T, P)
        first = jnp.min(jnp.where(is_min, iota_p, p), axis=1, keepdims=True)
        sel = iota_p == first                                 # (T, P) one-hot
        selected_hit = cur[:, 0] < BIG * 0.5
        pick = lambda m: jnp.sum(jnp.where(sel, m, 0.0), axis=1)
        store(
            kk,
            jnp.where(selected_hit, cur[:, 0], BIG),
            jnp.where(selected_hit, pick(t_out_m), BIG),
            jnp.where(selected_hit, pick(sem[None, :] * jnp.ones((t, 1))), -1.0),
            jnp.where(selected_hit, pick(inst[None, :] * jnp.ones((t, 1))), -1.0),
        )
        work = jnp.where(sel, BIG, work)                      # remove selected


def _kernel(rays_ref, prim_ref, meta_ref, tin_ref, tout_ref, sem_ref, inst_ref,
            *, p: int, k: int, near: float, far: float, f: int = 0):
    """Single-table kernel: one prim table shared by every ray tile."""

    def store(kk, t_in, t_out, sem, inst):
        tin_ref[:, kk] = t_in
        tout_ref[:, kk] = t_out
        sem_ref[:, kk] = sem
        inst_ref[:, kk] = inst

    _intersect_tile(rays_ref[...], prim_ref[...], store, p=p, k=k, near=near,
                    far=far, f=f)


def _kernel_grouped(rays_ref, prim_ref, tin_ref, tout_ref, sem_ref, inst_ref,
                    *, p: int, k: int, near: float, far: float, f: int = 0):
    """Grouped kernel: blocks carry a leading singleton GROUP dim — the
    group axis is a real grid dimension (grid (G, M/T)), NOT a vmap over
    pallas_call. vmap folds the batch into the kernel block, multiplying
    every internal (T, P) temp by G; with the unrolled cut-plane loop that
    overflowed the 16 MB scoped-VMEM window at stress scale (G=8, F=8:
    44 MB requested). As a grid dim, VMEM stays bounded by one tile."""

    def store(kk, t_in, t_out, sem, inst):
        tin_ref[0, :, kk] = t_in
        tout_ref[0, :, kk] = t_out
        sem_ref[0, :, kk] = sem
        inst_ref[0, :, kk] = inst

    _intersect_tile(rays_ref[0], prim_ref[0], store, p=p, k=k, near=near,
                    far=far, f=f)


def _pack_prim_rows(prims: Primitives) -> tuple[jnp.ndarray, int]:
    """(P_pad, 128) rows [A(12) | valid | sem | inst | planes(F*4)], F."""
    p = prims.world_to_prim.shape[0]
    p_pad = _round_up(p, 8)
    f = 0 if prims.cut_planes is None else prims.cut_planes.shape[1]
    if 15 + 4 * f > 128:
        raise ValueError(f"cut-plane count {f} exceeds the 128-lane prim row")
    rows = jnp.zeros((p_pad, 128), jnp.float32)
    rows = rows.at[:p, 0:12].set(prims.world_to_prim.reshape(p, 12))
    rows = rows.at[:p, 12].set(prims.valid.astype(jnp.float32))
    rows = rows.at[:p, 13].set(prims.semantic.astype(jnp.float32))
    rows = rows.at[:p, 14].set(prims.instance.astype(jnp.float32))
    if f:
        rows = rows.at[:p, 15:15 + 4 * f].set(prims.cut_planes.reshape(p, 4 * f))
    return rows, f


def intersect_rays_pallas(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    prims: Primitives,
    near: float,
    far: float,
    k: int,
    tile: int = 256,
    interpret: bool = False,
) -> RayIntervals:
    """Shared-prims intersection via the fused kernel; same contract as
    ops.intersect.intersect_rays. Convex cut planes are handled in-kernel."""
    n = rays_o.shape[0]
    p = prims.world_to_prim.shape[0]
    k_pad = _round_up(k, 128)

    prim_rows, f = _pack_prim_rows(prims)
    tile = _cap_tile(tile, f)
    rays = jnp.zeros((_round_up(max(n, tile), tile), 128), jnp.float32)
    rays = rays.at[:n, 0:3].set(rays_o).at[:n, 3:6].set(rays_d)

    p_pad = prim_rows.shape[0]
    meta = jnp.zeros((1, 128), jnp.float32)

    n_pad = rays.shape[0]
    outs = pl.pallas_call(
        functools.partial(_kernel, p=p, k=k, near=near, far=far, f=f),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32) for _ in range(4)
        ),
        grid_spec=pl.GridSpec(
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((tile, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(4)
            ),
        ),
        interpret=interpret,
    )(rays, prim_rows, meta)
    t_in, t_out, sem, inst = [o[:n, :k] for o in outs]
    mask = t_in < BIG * 0.5
    return RayIntervals(
        t_in=jnp.where(mask, t_in, BIG),
        t_out=jnp.where(mask, t_out, BIG),
        semantic=jnp.where(mask, sem, -1.0).astype(jnp.int32),
        instance=jnp.where(mask, inst, -1.0).astype(jnp.int32),
        mask=mask,
    )


def _pack_prim_rows_grouped(prims: Primitives) -> tuple[jnp.ndarray, int]:
    """(G, P_pad, 128) rows [A(12) | valid | sem | inst | planes(F*4)], F."""
    g, p = prims.world_to_prim.shape[:2]
    p_pad = _round_up(p, 8)
    f = 0 if prims.cut_planes is None else prims.cut_planes.shape[2]
    if 15 + 4 * f > 128:
        raise ValueError(f"cut-plane count {f} exceeds the 128-lane prim row")
    rows = jnp.zeros((g, p_pad, 128), jnp.float32)
    rows = rows.at[:, :p, 0:12].set(prims.world_to_prim.reshape(g, p, 12))
    rows = rows.at[:, :p, 12].set(prims.valid.astype(jnp.float32))
    rows = rows.at[:, :p, 13].set(prims.semantic.astype(jnp.float32))
    rows = rows.at[:, :p, 14].set(prims.instance.astype(jnp.float32))
    if f:
        rows = rows.at[:, :p, 15:15 + 4 * f].set(
            prims.cut_planes.reshape(g, p, 4 * f))
    return rows, f


def intersect_groups_pallas(
    rays_o: jnp.ndarray,      # (G, M, 3)
    rays_d: jnp.ndarray,      # (G, M, 3)
    prims: Primitives,        # leading group dim: w2p (G, P, 3, 4), ... (G, P)
    near: float,
    far: float,
    k: int,
    tile: int = 256,
    interpret: bool = False,
) -> RayIntervals:
    """Grouped-view train-path intersection (one prim table per view group,
    see data.dataset.batch_intervals): grid (G, M/T), each grid step loading
    its group's prim table and one ray tile. Returns RayIntervals with
    leading shape (G, M). Deliberately NOT a vmap of intersect_rays_pallas —
    see _kernel_grouped for the scoped-VMEM rationale."""
    g, m = rays_o.shape[:2]
    p = prims.world_to_prim.shape[1]
    prim_rows, f = _pack_prim_rows_grouped(prims)
    p_pad = prim_rows.shape[1]
    tile = min(_cap_tile(tile, f), _round_up(m, 8))
    k_pad = _round_up(k, 128)
    m_pad = _round_up(max(m, tile), tile)

    rays = jnp.zeros((g, m_pad, 128), jnp.float32)
    rays = rays.at[:, :m, 0:3].set(rays_o).at[:, :m, 3:6].set(rays_d)

    outs = pl.pallas_call(
        functools.partial(_kernel_grouped, p=p, k=k, near=near, far=far, f=f),
        out_shape=tuple(
            jax.ShapeDtypeStruct((g, m_pad, k_pad), jnp.float32) for _ in range(4)
        ),
        grid_spec=pl.GridSpec(
            grid=(g, m_pad // tile),
            in_specs=[
                pl.BlockSpec((1, tile, 128), lambda gi, i: (gi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_pad, 128), lambda gi, i: (gi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((1, tile, k_pad), lambda gi, i: (gi, i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ),
        ),
        interpret=interpret,
    )(rays, prim_rows)
    t_in, t_out, sem, inst = [o[:, :m, :k] for o in outs]
    mask = t_in < BIG * 0.5
    return RayIntervals(
        t_in=jnp.where(mask, t_in, BIG),
        t_out=jnp.where(mask, t_out, BIG),
        semantic=jnp.where(mask, sem, -1.0).astype(jnp.int32),
        instance=jnp.where(mask, inst, -1.0).astype(jnp.int32),
        mask=mask,
    )
