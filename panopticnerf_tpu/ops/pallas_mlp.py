"""Pallas TPU kernel: fused NeRF MLP evaluation.

Why a hand kernel (SURVEY.md §2.3: the rebuild's 'native component' slot):
the render hot loop evaluates an 8x256 MLP over rays*samples points. The
whole parameter set (~2.4 MB f32 / 1.2 MB bf16) fits in VMEM, so the fused
kernel pins every layer's weights on-chip for the kernel's lifetime and
streams point tiles through the MXU — one HBM read of the weights per
*kernel launch* instead of per layer-matmul, and zero intermediate HBM
traffic between layers (activations never leave VMEM).

Layout: inputs are pre-encoded features (positional encoding is cheap VPU
work XLA fuses into the first matmul's producer either way; keeping it
outside lets the kernel stay shape-generic). All feature dims are padded to
the 128-lane boundary by the caller wrapper.

Forward-only: used on the inference/eval render path. Training keeps the
XLA autodiff path (same math, verified against this kernel in tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class MLPWeights(NamedTuple):
    """Padded dense stack for the fused kernel.

    trunk_w: (L, F, W)   trunk_b: (L, W)  — layer 0 consumes x_enc (padded
    to F); skip layers consume [h, x_enc] (W + F <= F_pad columns, see pack).
    heads: sigma/sem/feature/color fused into two output matmuls:
      head1_w: (W, H1) head1_b: (H1,)   [sigma | semantic | feature]
      head2_w: (W + D, H2) head2_b: (H2,)  [color branch after dir concat]
    """

    trunk_w: jnp.ndarray
    trunk_b: jnp.ndarray
    skip_mask: np.ndarray  # host bool (L,): layer i consumes [h, x_enc]


def _mlp_kernel(x_ref, w_ref, b_ref, out_ref, *, layers: int, skips: tuple):
    """One point-tile through the trunk. x_ref: (T, F); w_ref: (L, In, W);
    b_ref: (L, 1, W); out_ref: (T, W). Input widths are static per layer, so
    each layer statically slices just the weight rows it consumes."""
    x = x_ref[:]                                   # (T, F) encoded input
    h = x
    for i in range(layers):
        if i == 0:
            inp = x
        elif i in skips:
            inp = jnp.concatenate([h, x], axis=-1)  # [h | x], static widths
        else:
            inp = h
        w = w_ref[i][: inp.shape[-1], :]            # (F_in_i, W) static slice
        b = b_ref[i]                                # (1, W)
        h = jnp.maximum(
            jnp.dot(inp, w, preferred_element_type=jnp.float32) + b, 0.0
        ).astype(x.dtype)
    out_ref[:] = h


def fused_trunk(x_enc: jnp.ndarray, weights, biases, skips: tuple[int, ...],
                tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Run the trunk MLP over (N, F) encoded points with VMEM-resident weights.

    weights: list of (F_in_i, W) arrays (unpadded); biases: list of (W,).
    Returns (N, W) float32 activations (pre-head trunk output).
    """
    n, f = x_enc.shape
    layers = len(weights)
    width = weights[-1].shape[-1]
    f_pad = _round_up(f, 128)
    w_pad = _round_up(width, 128)
    # static per-layer padded input widths: layer 0 reads x (f_pad); skip
    # layers read [h | x] (w_pad + f_pad); the rest read h (w_pad)
    in_max = max(f_pad, (w_pad + f_pad) if skips else w_pad)

    dtype = x_enc.dtype
    # pack weights into one (L, in_max, w_pad) block
    wp = np.zeros((layers, in_max, w_pad), np.float32)
    bp = np.zeros((layers, 1, w_pad), np.float32)
    for i, (w, b) in enumerate(zip(weights, biases)):
        wi = np.asarray(w, np.float32)
        if i in skips:
            # kernel feeds [h (w_pad), x (f_pad)]; rows of w are [W..., F...]
            rows = np.zeros((w_pad + f_pad, w_pad), np.float32)
            rows[:width, : wi.shape[1]] = wi[: width]
            rows[w_pad : w_pad + f, : wi.shape[1]] = wi[width : width + f]
            wi = rows
        elif i == 0:
            rows = np.zeros((f_pad, w_pad), np.float32)
            rows[: wi.shape[0], : wi.shape[1]] = wi
            wi = rows
        else:
            rows = np.zeros((w_pad, w_pad), np.float32)
            rows[: wi.shape[0], : wi.shape[1]] = wi
            wi = rows
        wp[i, : wi.shape[0], : wi.shape[1]] = wi
        bp[i, 0, : b.shape[0]] = np.asarray(b, np.float32)
    wp_j = jnp.asarray(wp, dtype)
    bp_j = jnp.asarray(bp, jnp.float32)

    n_pad = _round_up(max(n, tile), tile)
    x_p = jnp.zeros((n_pad, f_pad), dtype).at[:n, :f].set(x_enc)

    grid = (n_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, layers=layers, skips=tuple(skips)),
        out_shape=jax.ShapeDtypeStruct((n_pad, w_pad), dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((layers, in_max, w_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((layers, 1, w_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x_p, wp_j, bp_j)
    return out[:n, :width].astype(jnp.float32)
