"""Pallas fused NeRF-trunk with custom VJP — the training hot-path kernel.

Why: XLA cannot fuse matmul chains, so the 8-layer trunk round-trips its
(rays*samples, 256) activations through HBM at every layer, forward and
backward — cost analysis shows the flagship train step touches ~13.7 GB of
HBM per step, which is precisely its ~17 ms wall time on a v5e. This kernel
keeps a point-tile's activations entirely in VMEM:

  forward:  one grid pass; per tile, all L matmuls run back-to-back in VMEM.
  backward: recompute-in-VMEM — per tile, rerun the forward (activations
            live only in registers/VMEM), then backprop through the tile,
            accumulating weight/bias grads into VMEM output blocks that
            persist across the sequential TPU grid (init-on-first-step +
            accumulate pattern).

HBM traffic drops to O(N*(F+W)) tile I/O + one weight read per pass instead
of O(N*W*L) activation round-trips.

Weights are packed per layer into one (L, In_max, W_pad) block (row layout
below); packing is jnp (traceable), so this works under jit/grad with flax
param tracers. Gradients accumulate in f32 regardless of compute dtype.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --- backward-kernel tuning switches (trace-time; flipped by tools/ab_bwd.py
# for interleaved A/B on hardware) ---
# "dg": express dW = sum_n inp[n]::g[n] and g_in = g @ W^T as dot_generals
#       with contraction dimension numbers, letting Mosaic feed the MXU
#       without materializing operand transposes in VMEM.
# "transpose": the round-2 formulation (explicit inp.T / w.T).
BWD_MATMUL_MODE = "dg"
# Accumulate dW across grid steps in bf16 instead of f32 (halves the
# read-modify-write traffic on the persistent VMEM accumulator).
DW_ACCUM_BF16 = False
# Store recomputed activations in the compute dtype (bf16) instead of f32
# inside the backward kernel — halves the per-tile VMEM activation
# footprint (8 x tile x 256), trading it for cast ops on the relu masks.
ACT_STORE_BF16 = False
# Backward-kernel tile override (None = same as forward tile).
BWD_TILE = None


def pack_trunk(weights: Sequence[jnp.ndarray], biases: Sequence[jnp.ndarray],
               skips: tuple[int, ...], f: int, dtype=jnp.float32):
    """Pack per-layer (F_in_i, W) weights into (L, In_max, W_pad) + (L, 1, W_pad).

    Skip-layer rows follow the kernel's concat([h, x]) order: rows [0, W)
    hold the h-part, rows [W_pad, W_pad + F) the x-part. Pure jnp.
    """
    layers = len(weights)
    width = weights[-1].shape[-1]
    f_pad = _round_up(f, 128)
    w_pad = _round_up(width, 128)
    in_max = max(f_pad, (w_pad + f_pad) if skips else w_pad)
    wp = jnp.zeros((layers, in_max, w_pad), dtype)
    bp = jnp.zeros((layers, 1, w_pad), jnp.float32)
    for i, (w, b) in enumerate(zip(weights, biases)):
        w = w.astype(dtype)
        if i in skips:
            wp = wp.at[i, :width, :width].set(w[:width])
            wp = wp.at[i, w_pad : w_pad + f, :width].set(w[width : width + f])
        elif i == 0:
            wp = wp.at[i, :f, :width].set(w)
        else:
            wp = wp.at[i, :width, :width].set(w)
        bp = bp.at[i, 0, :width].set(b.astype(jnp.float32))
    return wp, bp, (f_pad, w_pad, in_max)



def _recompute_forward(x, w_ref, b_ref, layers, skips, store_dtype=None):
    """Shared trunk math; activations are computed in f32 (comparisons and
    accumulation stay f32 — bf16 compares are not supported by Mosaic on
    all TPU targets) and optionally STORED as `store_dtype` (bf16 halves
    the per-tile VMEM footprint); matmul inputs cast to the compute dtype."""
    acts = []
    h_f32 = None
    for i in range(layers):
        if i == 0:
            inp = x
        else:
            h_c = h_f32.astype(x.dtype)
            inp = jnp.concatenate([h_c, x], -1) if i in skips else h_c
        w = w_ref[i][: inp.shape[-1], :]
        pre = jnp.dot(inp, w, preferred_element_type=jnp.float32) + b_ref[i]
        h_f32 = jnp.maximum(pre, 0.0)
        acts.append(h_f32 if store_dtype is None else h_f32.astype(store_dtype))
    return acts


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, layers, skips):
    acts = _recompute_forward(x_ref[:], w_ref, b_ref, layers, skips)
    out_ref[:] = acts[-1].astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w_ref, b_ref, dx_ref, dw_ref, db_ref, *,
                layers, skips, f_pad, w_pad):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:]
    store_dt = x.dtype if ACT_STORE_BF16 else None
    acts = _recompute_forward(x, w_ref, b_ref, layers, skips,
                              store_dtype=store_dt)

    cdt = x.dtype  # compute dtype for MXU inputs (bf16 at flagship config)
    use_dg = BWD_MATMUL_MODE == "dg"
    g = g_ref[:].astype(jnp.float32)
    gx = jnp.zeros((x.shape[0], f_pad), jnp.float32)
    for i in reversed(range(layers)):
        g = g * (acts[i].astype(jnp.float32) > 0.0).astype(jnp.float32)
        if i == 0:
            inp = x
        else:
            prev = acts[i - 1].astype(cdt)
            inp = jnp.concatenate([prev, x], -1) if i in skips else prev
        in_w = inp.shape[-1]
        g_c = g.astype(cdt)  # bf16 MXU inputs, f32 accumulation
        if use_dg:
            # dW[k, o] = sum_n inp[n, k] g[n, o]: contract the point axis of
            # both operands directly — no transposed VMEM copy of `inp`.
            dw = jax.lax.dot_general(
                inp, g_c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            dw = jnp.dot(inp.T, g_c, preferred_element_type=jnp.float32)
        dw_ref[i, :in_w, :] += dw.astype(dw_ref.dtype)
        db_ref[i, 0, :] += jnp.sum(g, axis=0).astype(db_ref.dtype)
        if use_dg:
            # g_in[n, k] = sum_o g[n, o] W[k, o]: contract the output axis
            # of both operands — no W^T copy.
            g_inp = jax.lax.dot_general(
                g_c, w_ref[i][:in_w, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            g_inp = jnp.dot(g_c, w_ref[i][:in_w, :].T,
                            preferred_element_type=jnp.float32)
        if i == 0:
            gx = gx + g_inp[:, :f_pad]
        elif i in skips:
            gx = gx + g_inp[:, w_pad : w_pad + f_pad]
            g = g_inp[:, :w_pad]
        else:
            g = g_inp
    dx_ref[:] = gx.astype(dx_ref.dtype)


def _pad_points(x, f_pad, tile):
    n, f = x.shape
    n_pad = _round_up(max(n, tile), tile)
    return jnp.zeros((n_pad, f_pad), x.dtype).at[:n, :f].set(x), n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def trunk_train(x_enc, wp, bp, skips, dims, tile, interpret):
    """Differentiable fused trunk on packed weights.

    x_enc (N, F); wp (L, In_max, W_pad); bp (L, 1, W_pad);
    dims = (f, f_pad, w_pad, width). Returns (N, width) f32.
    """
    return _trunk_fwd_impl(x_enc, wp, bp, skips, dims, tile, interpret)


def _trunk_fwd_impl(x_enc, wp, bp, skips, dims, tile, interpret):
    f, f_pad, w_pad, width = dims
    layers = wp.shape[0]
    n = x_enc.shape[0]
    x_p, n_pad = _pad_points(x_enc, f_pad, tile)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, layers=layers, skips=tuple(skips)),
        out_shape=jax.ShapeDtypeStruct((n_pad, w_pad), x_enc.dtype),
        grid_spec=pl.GridSpec(
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(wp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(bp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x_p, wp, bp)
    return out[:n, :width].astype(jnp.float32)


def _trunk_fwd_rule(x_enc, wp, bp, skips, dims, tile, interpret):
    out = _trunk_fwd_impl(x_enc, wp, bp, skips, dims, tile, interpret)
    return out, (x_enc, wp, bp)


def _trunk_bwd_rule(skips, dims, tile, interpret, res, g):
    x_enc, wp, bp = res
    f, f_pad, w_pad, width = dims
    layers = wp.shape[0]
    n = x_enc.shape[0]
    tile = BWD_TILE or tile
    x_p, n_pad = _pad_points(x_enc, f_pad, tile)
    g_p = jnp.zeros((n_pad, w_pad), jnp.float32).at[:n, :width].set(g.astype(jnp.float32))
    acc_dt = jnp.bfloat16 if DW_ACCUM_BF16 else jnp.float32
    dx, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, layers=layers, skips=tuple(skips),
                          f_pad=f_pad, w_pad=w_pad),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, f_pad), x_enc.dtype),
            jax.ShapeDtypeStruct(wp.shape, acc_dt),
            jax.ShapeDtypeStruct(bp.shape, acc_dt),
        ),
        grid_spec=pl.GridSpec(
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(wp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(bp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(wp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(bp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(x_p, g_p, wp, bp)
    return dx[:n, :f].astype(x_enc.dtype), dwp.astype(wp.dtype), dbp.astype(bp.dtype)


trunk_train.defvjp(_trunk_fwd_rule, _trunk_bwd_rule)


def fused_trunk_train(x_enc: jnp.ndarray, weights, biases,
                      skips: tuple[int, ...], tile: int = 512,
                      interpret: bool = False,
                      chunk: int = 32_768) -> jnp.ndarray:
    """Differentiable fused trunk from per-layer weight/bias lists.

    Large point counts are split into `chunk`-point lax.map segments. This
    began as a workaround for a platform regalloc bug (resolved — see
    docs/REGALLOC_RETCHECK.md; un-chunked 524k-pt calls now compile) but
    measures FASTER than one big call: 32,768-pt segments beat 131,072 by
    ~6% full-step time and 262,144+ by ~7% at the flagship shape
    (tools/ab_chunk.py, interleaved medians; flat 16k-64k, cliff above).
    Each segment still runs the full VMEM-resident kernel.
    """
    f = x_enc.shape[-1]
    width = weights[-1].shape[-1]
    wp, bp, (f_pad, w_pad, in_max) = pack_trunk(weights, biases, tuple(skips), f,
                                                dtype=x_enc.dtype)
    dims = (f, f_pad, w_pad, width)
    n = x_enc.shape[0]
    if n <= chunk:
        return trunk_train(x_enc, wp, bp, tuple(skips), dims, tile, interpret)
    n_pad = _round_up(n, chunk)
    x_p = jnp.zeros((n_pad, f), x_enc.dtype).at[:n].set(x_enc)
    out = jax.lax.map(
        lambda xc: trunk_train(xc, wp, bp, tuple(skips), dims, tile, interpret),
        x_p.reshape(-1, chunk, f),
    )
    return out.reshape(n_pad, width)[:n]

