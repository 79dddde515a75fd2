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
per-view intersection / eval rendering). Cut planes are not handled here
(fall back to the XLA path when present).
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


def _kernel(rays_ref, prim_ref, meta_ref, tin_ref, tout_ref, sem_ref, inst_ref,
            *, p: int, k: int, near: float, far: float):
    """rays_ref (T, 128): [ox oy oz dx dy dz ...pad]; prim_ref (P_pad, 128):
    rows [A(12) | valid | sem | inst | ...pad]; meta unused (reserved).
    Outputs (T, K_pad)."""
    t = rays_ref.shape[0]
    o = rays_ref[:, 0:3]                                     # (T, 3)
    d = rays_ref[:, 3:6]

    A = prim_ref[:p, 0:12]                                   # (P, 12) rows of (3,4)
    valid = prim_ref[:p, 12]                                 # (P,) 0/1
    sem = prim_ref[:p, 13]
    inst = prim_ref[:p, 14]

    # local coords per (ray, prim): o_l[t,p,i] = A[p, 4i:4i+3] . o[t] + A[p, 4i+3]
    t_lo = jnp.full((t, p), -BIG, jnp.float32)
    t_hi = jnp.full((t, p), BIG, jnp.float32)
    for i in range(3):
        r0, r1, r2, tr = A[:, 4 * i], A[:, 4 * i + 1], A[:, 4 * i + 2], A[:, 4 * i + 3]
        o_l = (o[:, 0:1] * r0[None] + o[:, 1:2] * r1[None]
               + o[:, 2:3] * r2[None] + tr[None])            # (T, P)
        d_l = (d[:, 0:1] * r0[None] + d[:, 1:2] * r1[None] + d[:, 2:3] * r2[None])
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
        tin_ref[:, kk] = jnp.where(selected_hit, cur[:, 0], BIG)
        tout_ref[:, kk] = jnp.where(selected_hit, pick(t_out_m), BIG)
        sem_ref[:, kk] = jnp.where(selected_hit, pick(sem[None, :] * jnp.ones((t, 1))), -1.0)
        inst_ref[:, kk] = jnp.where(selected_hit, pick(inst[None, :] * jnp.ones((t, 1))), -1.0)
        work = jnp.where(sel, BIG, work)                      # remove selected


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
    ops.intersect.intersect_rays (cut_planes unsupported -> assert None)."""
    assert prims.cut_planes is None, "pallas path does not support cut planes yet"
    n = rays_o.shape[0]
    p = prims.world_to_prim.shape[0]
    k_pad = _round_up(k, 128)
    p_pad = _round_up(p, 8)

    rays = jnp.zeros((_round_up(max(n, tile), tile), 128), jnp.float32)
    rays = rays.at[:n, 0:3].set(rays_o).at[:n, 3:6].set(rays_d)

    prim_rows = jnp.zeros((p_pad, 128), jnp.float32)
    prim_rows = prim_rows.at[:p, 0:12].set(prims.world_to_prim.reshape(p, 12))
    prim_rows = prim_rows.at[:p, 12].set(prims.valid.astype(jnp.float32))
    prim_rows = prim_rows.at[:p, 13].set(prims.semantic.astype(jnp.float32))
    prim_rows = prim_rows.at[:p, 14].set(prims.instance.astype(jnp.float32))
    meta = jnp.zeros((1, 128), jnp.float32)

    n_pad = rays.shape[0]
    outs = pl.pallas_call(
        functools.partial(_kernel, p=p, k=k, near=near, far=far),
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
