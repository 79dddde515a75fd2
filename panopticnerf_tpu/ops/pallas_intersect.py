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
folded into the same pass: a separate (F, 4, P_pad) operand carries the
half-space coefficients [n | b] per (plane, prim) — lanes on the prim axis
to match the (T, P) compute layout — and the slab range is refined
in-kernel, vectorized over F, exactly as in
ops.intersect.ray_box_intervals.

Hardware parity note (v5e, measured round 3): vs the XLA path the kernel
flips ~0.02-0.04% of interval slots whose hit test sits on a float decision
boundary (VPU fma/reciprocal association differs from XLA's lowering; f=0
and f>0 alike). Interpret-mode tests pin exact parity of the algorithm;
on-hardware boundary flips are immaterial to guided sampling (stochastic
sample placement inside intervals). NOTE: eval/full-image renders also use
this kernel when `render.use_pallas_intersect` is set (the flagship
configs set it) — when chasing a tiny eval-metric discrepancy vs the XLA
path on hardware, flip that key off before suspecting anything else.
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
    """Ray-tile cap for the cut-plane kernel. The plane refinement's
    (F, T, P) temps scale Mosaic's scoped-VMEM stack by f*tile; measured
    on v5e (P_pad=32, K=12) the vectorized form fits the 16 MB window at
    f=8 x tile 256 (the pre-round-3 python-unrolled form needed 44 MB —
    Mosaic stack-allocates unrolled per-iteration temps without reuse).
    Scale the tile down for deeper plane budgets; total work is unchanged
    (the grid streams more, smaller tiles)."""
    if f <= 8:
        return tile
    return min(tile, max(64, _round_up(2048 // f, 8)))


def _intersect_tile(rays, prim, planes, store, *, p: int, k: int, near: float,
                    far: float, f: int = 0):
    """Core slab + top-K math on one ray tile.

    rays (T, 128): [ox oy oz dx dy dz ...pad]; prim (P_pad, 128): rows
    [A(12) | valid | sem | inst ...pad]; planes (F, 4, P_pad) half-space
    coefficients [n0 n1 n2 b] per (plane, prim), or None when f == 0
    (all-zero padding columns are all-pass in this formulation). Emits
    interval slot kk via store(kk, t_in, t_out, sem, inst), each value
    (T,) — the caller owns the output refs (and their leading block dims),
    so the single-table and grouped kernels share this body."""
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
        # (a < 0), or is a hard miss (a ~ 0 and c < 0). Vectorized over the
        # plane axis as (F, T, P) — F leads (untiled), lanes stay on P —
        # instead of an unrolled python loop: Mosaic stack-allocates the
        # unrolled form's per-iteration temps without reuse, which is what
        # blew the scoped-VMEM window at F=8 (see _cap_tile).
        eps = 1e-9
        n0 = planes[:, 0, :p]                                          # (F, P)
        n1 = planes[:, 1, :p]
        n2 = planes[:, 2, :p]
        b = planes[:, 3, :p]
        a = (n0[:, None, :] * d_ls[0][None] + n1[:, None, :] * d_ls[1][None]
             + n2[:, None, :] * d_ls[2][None])                         # (F, T, P)
        c = b[:, None, :] - (n0[:, None, :] * o_ls[0][None]
                             + n1[:, None, :] * o_ls[1][None]
                             + n2[:, None, :] * o_ls[2][None])
        safe_a = jnp.where(jnp.abs(a) < eps, eps, a)
        t_plane = c / safe_a
        t_lo = jnp.maximum(
            t_lo, jnp.max(jnp.where(a < -eps, t_plane, -BIG), axis=0))
        t_hi = jnp.minimum(
            t_hi, jnp.min(jnp.where(a > eps, t_plane, BIG), axis=0))
        miss = jnp.any((jnp.abs(a) <= eps) & (c < 0), axis=0)
        t_hi = jnp.where(miss, -BIG, t_hi)

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


def _kernel(rays_ref, prim_ref, *refs,
            p: int, k: int, near: float, far: float, f: int = 0):
    """Single-table kernel: one prim table shared by every ray tile.
    refs = (planes_ref if f else) + (tin, tout, sem, inst)."""
    planes = refs[0][...] if f else None
    tin_ref, tout_ref, sem_ref, inst_ref = refs[1:] if f else refs

    def store(kk, t_in, t_out, sem, inst):
        tin_ref[:, kk] = t_in
        tout_ref[:, kk] = t_out
        sem_ref[:, kk] = sem
        inst_ref[:, kk] = inst

    _intersect_tile(rays_ref[...], prim_ref[...], planes, store, p=p, k=k,
                    near=near, far=far, f=f)


def _kernel_grouped(rays_ref, prim_ref, *refs,
                    p: int, k: int, near: float, far: float, f: int = 0):
    """Grouped kernel: blocks carry a leading singleton GROUP dim — the
    group axis is a real grid dimension (grid (G, M/T)), never a vmap over
    pallas_call, which would fold G into the block and multiply every
    internal temp by G (the scoped-VMEM story lives in _cap_tile)."""
    planes = refs[0][0] if f else None
    tin_ref, tout_ref, sem_ref, inst_ref = refs[1:] if f else refs

    def store(kk, t_in, t_out, sem, inst):
        tin_ref[0, :, kk] = t_in
        tout_ref[0, :, kk] = t_out
        sem_ref[0, :, kk] = sem
        inst_ref[0, :, kk] = inst

    _intersect_tile(rays_ref[0], prim_ref[0], planes, store, p=p, k=k,
                    near=near, far=far, f=f)


def _pack_prim_rows(prims: Primitives) -> jnp.ndarray:
    """(P_pad, 128) rows [A(12) | valid | sem | inst]."""
    p = prims.world_to_prim.shape[0]
    p_pad = _round_up(p, 8)
    rows = jnp.zeros((p_pad, 128), jnp.float32)
    rows = rows.at[:p, 0:12].set(prims.world_to_prim.reshape(p, 12))
    rows = rows.at[:p, 12].set(prims.valid.astype(jnp.float32))
    rows = rows.at[:p, 13].set(prims.semantic.astype(jnp.float32))
    rows = rows.at[:p, 14].set(prims.instance.astype(jnp.float32))
    return rows


def _pack_planes(cut_planes, p_pad: int):
    """cut_planes (..., P, F, 4) -> ((..., F, 4, P_pad), F) plane operand.

    Lanes carry the prim axis (matching the (T, P) compute layout); the
    plane axis leads. Zero padding columns are all-pass (n = 0, b = 0:
    no entering/leaving constraint and no hard miss)."""
    if cut_planes is None:
        return None, 0
    *lead, p, f, _ = cut_planes.shape
    planes = jnp.zeros((*lead, f, 4, p_pad), jnp.float32)
    src = jnp.moveaxis(cut_planes, -3, -1)  # (..., F, 4, P)
    return planes.at[..., :p].set(src), f


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

    prim_rows = _pack_prim_rows(prims)
    p_pad = prim_rows.shape[0]
    planes, f = _pack_planes(prims.cut_planes, p_pad)
    tile = _cap_tile(tile, f)
    rays = jnp.zeros((_round_up(max(n, tile), tile), 128), jnp.float32)
    rays = rays.at[:n, 0:3].set(rays_o).at[:n, 3:6].set(rays_d)

    operands = [rays, prim_rows]
    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if f:
        operands.append(planes)
        in_specs.append(pl.BlockSpec((f, 4, p_pad), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))

    n_pad = rays.shape[0]
    outs = pl.pallas_call(
        functools.partial(_kernel, p=p, k=k, near=near, far=far, f=f),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32) for _ in range(4)
        ),
        grid_spec=pl.GridSpec(
            grid=(n_pad // tile,),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((tile, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(4)
            ),
        ),
        interpret=interpret,
    )(*operands)
    t_in, t_out, sem, inst = [o[:n, :k] for o in outs]
    mask = t_in < BIG * 0.5
    return RayIntervals(
        t_in=jnp.where(mask, t_in, BIG),
        t_out=jnp.where(mask, t_out, BIG),
        semantic=jnp.where(mask, sem, -1.0).astype(jnp.int32),
        instance=jnp.where(mask, inst, -1.0).astype(jnp.int32),
        mask=mask,
    )


def _pack_prim_rows_grouped(prims: Primitives) -> jnp.ndarray:
    """(G, P_pad, 128) rows [A(12) | valid | sem | inst]."""
    g, p = prims.world_to_prim.shape[:2]
    p_pad = _round_up(p, 8)
    rows = jnp.zeros((g, p_pad, 128), jnp.float32)
    rows = rows.at[:, :p, 0:12].set(prims.world_to_prim.reshape(g, p, 12))
    rows = rows.at[:, :p, 12].set(prims.valid.astype(jnp.float32))
    rows = rows.at[:, :p, 13].set(prims.semantic.astype(jnp.float32))
    rows = rows.at[:, :p, 14].set(prims.instance.astype(jnp.float32))
    return rows


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
    prim_rows = _pack_prim_rows_grouped(prims)
    p_pad = prim_rows.shape[1]
    planes, f = _pack_planes(prims.cut_planes, p_pad)   # (G, F, 4, P_pad)
    tile = min(_cap_tile(tile, f), _round_up(m, 8))
    k_pad = _round_up(k, 128)
    m_pad = _round_up(max(m, tile), tile)

    rays = jnp.zeros((g, m_pad, 128), jnp.float32)
    rays = rays.at[:, :m, 0:3].set(rays_o).at[:, :m, 3:6].set(rays_d)

    operands = [rays, prim_rows]
    in_specs = [
        pl.BlockSpec((1, tile, 128), lambda gi, i: (gi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p_pad, 128), lambda gi, i: (gi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if f:
        operands.append(planes)
        in_specs.append(pl.BlockSpec((1, f, 4, p_pad),
                                     lambda gi, i: (gi, 0, 0, 0),
                                     memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_kernel_grouped, p=p, k=k, near=near, far=far, f=f),
        out_shape=tuple(
            jax.ShapeDtypeStruct((g, m_pad, k_pad), jnp.float32) for _ in range(4)
        ),
        grid_spec=pl.GridSpec(
            grid=(g, m_pad // tile),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((1, tile, k_pad), lambda gi, i: (gi, i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ),
        ),
        interpret=interpret,
    )(*operands)
    t_in, t_out, sem, inst = [o[:, :m, :k] for o in outs]
    mask = t_in < BIG * 0.5
    return RayIntervals(
        t_in=jnp.where(mask, t_in, BIG),
        t_out=jnp.where(mask, t_out, BIG),
        semantic=jnp.where(mask, sem, -1.0).astype(jnp.int32),
        instance=jnp.where(mask, inst, -1.0).astype(jnp.int32),
        mask=mask,
    )
