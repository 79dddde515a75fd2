"""Pallas fused FULL-FIELD kernel (trunk + all heads) with custom VJP.

Why (measured, v5e, tools/mlp_microbench.py): even a pure 8x256 bf16 relu
chain only reaches ~37% MXU under XLA because every layer round-trips its
(N, 256) activations through HBM — the field network is BANDWIDTH-bound,
not FLOP-bound. ops/pallas_mlp_train.py keeps the trunk VMEM-resident but
leaves the heads (sigma / semantic / feature / color) in XLA, so the trunk
output and every head activation still travel through HBM. This kernel
fuses the ENTIRE field — PE'd inputs in, (sigma, rgb_logits, sem_logits)
out — forward and backward:

  forward:  per point-tile: 8-layer trunk, combined head matmul
            (sem_hidden | feature | sigma packed into ONE (W, *) weight
            block), semantic out, color branch (feature ⊕ dir-PE) — all
            back-to-back in VMEM.
  backward: recompute-in-VMEM, then backprop heads + trunk in the same
            tile, accumulating every dW/db into VMEM blocks that persist
            across the sequential grid.

HBM traffic per pass collapses to tile I/O (inputs ~(N,256), outputs
~(N,256)) + one weight read — O(100 MB) instead of the ~6 GB of layer
round-trips XLA needs at the flagship point count.

Reference scope note: the reference has NO native kernels (SURVEY.md §2.3,
pure torch); this is the TPU-native equivalent of its field forward+backward
([pn] lib/networks/panopticnerf/network.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from panopticnerf_tpu.ops.pallas_mlp_train import (
    _recompute_forward,
    _round_up,
    pack_trunk,
)


class FieldDims:
    """Static layout of the packed field (all multiples of 128)."""

    def __init__(self, *, x_dim: int, d_dim: int, width: int, sem_hidden: int,
                 color_width: int, num_classes: int, layers: int,
                 skips: tuple[int, ...], use_sem: bool):
        assert x_dim <= 128 and d_dim <= 128, "PE dims must fit one lane tile"
        assert sem_hidden <= 128 and color_width <= 128 and num_classes <= 128
        self.x_dim, self.d_dim = x_dim, d_dim
        self.width = width
        self.w_pad = _round_up(width, 128)
        self.f_pad = 128
        self.sem_hidden = sem_hidden
        self.sh_pad = 128 if use_sem else 0
        self.color_width = color_width
        self.cw_pad = 128
        self.num_classes = num_classes
        self.layers = layers
        self.skips = tuple(skips)
        self.use_sem = use_sem
        self.ho_w = self.sh_pad + self.w_pad + 128  # [sem_hidden | feature | sigma]
        self.ch_in = self.w_pad + 128               # [feature | dir-PE]

    def statics(self):
        return dict(layers=self.layers, skips=self.skips, f_pad=self.f_pad,
                    w_pad=self.w_pad, sh_pad=self.sh_pad, use_sem=self.use_sem)

    def _key(self):
        return (self.x_dim, self.d_dim, self.width, self.sem_hidden,
                self.color_width, self.num_classes, self.layers, self.skips,
                self.use_sem)

    # hashable so FieldDims can ride custom_vjp nondiff_argnums
    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, FieldDims) and self._key() == other._key()


def pack_field(p: dict, dims: FieldDims, dtype):
    """Pack one field level's flax params into MXU-aligned blocks (pure jnp,
    traceable — autodiff through the packing routes kernel weight-grads back
    to the original flax leaves)."""
    d = dims
    weights = [p[f"trunk_{i}"]["kernel"] for i in range(d.layers)]
    biases = [p[f"trunk_{i}"]["bias"] for i in range(d.layers)]
    # flax concatenates PE AFTER layer s; it is layer s+1 that consumes [h, x].
    wp, bp, _ = pack_trunk(weights, biases, d.skips, d.x_dim, dtype)

    hw = jnp.zeros((d.w_pad, d.ho_w), dtype)
    hb = jnp.zeros((1, d.ho_w), jnp.float32)
    off = 0
    if d.use_sem:
        hw = hw.at[: d.width, : d.sem_hidden].set(p["sem_hidden"]["kernel"].astype(dtype))
        hb = hb.at[0, : d.sem_hidden].set(p["sem_hidden"]["bias"].astype(jnp.float32))
        off = d.sh_pad
    hw = hw.at[: d.width, off : off + d.width].set(p["feature"]["kernel"].astype(dtype))
    hb = hb.at[0, off : off + d.width].set(p["feature"]["bias"].astype(jnp.float32))
    hw = hw.at[: d.width, off + d.w_pad : off + d.w_pad + 1].set(
        p["sigma"]["kernel"].astype(dtype))
    hb = hb.at[0, off + d.w_pad].set(p["sigma"]["bias"][0].astype(jnp.float32))

    if d.use_sem:
        wso = jnp.zeros((d.sh_pad, 128), dtype)
        bso = jnp.zeros((1, 128), jnp.float32)
        wso = wso.at[: d.sem_hidden, : d.num_classes].set(p["sem_out"]["kernel"].astype(dtype))
        bso = bso.at[0, : d.num_classes].set(p["sem_out"]["bias"].astype(jnp.float32))
    else:
        wso = jnp.zeros((128, 128), dtype)
        bso = jnp.zeros((1, 128), jnp.float32)

    wch = jnp.zeros((d.ch_in, d.cw_pad), dtype)
    bch = jnp.zeros((1, d.cw_pad), jnp.float32)
    ch_k = p["color_hidden"]["kernel"].astype(dtype)   # (width [+ d_dim], cw)
    wch = wch.at[: d.width, : d.color_width].set(ch_k[: d.width])
    if ch_k.shape[0] > d.width:  # viewdir branch present
        wch = wch.at[d.w_pad : d.w_pad + d.d_dim, : d.color_width].set(
            ch_k[d.width : d.width + d.d_dim])
    bch = bch.at[0, : d.color_width].set(p["color_hidden"]["bias"].astype(jnp.float32))

    wco = jnp.zeros((d.cw_pad, 128), dtype)
    bco = jnp.zeros((1, 128), jnp.float32)
    wco = wco.at[: d.color_width, :3].set(p["color_out"]["kernel"].astype(dtype))
    bco = bco.at[0, :3].set(p["color_out"]["bias"].astype(jnp.float32))
    return wp, bp, hw, hb, wso, bso, wch, bch, wco, bco


def _head_forward(x, dvec, acts, hw_ref, hb_ref, wso_ref, bso_ref, wch_ref,
                  bch_ref, wco_ref, bco_ref, *, w_pad, sh_pad, use_sem):
    """Shared head math (f32 activations, compute-dtype MXU inputs)."""
    cdt = x.dtype
    h = acts[-1].astype(cdt)
    ho = jnp.dot(h, hw_ref[:], preferred_element_type=jnp.float32) + hb_ref[:]
    if use_sem:
        s_pre = ho[:, :sh_pad]
        s = jnp.maximum(s_pre, 0.0)
        sem = jnp.dot(s.astype(cdt), wso_ref[:],
                      preferred_element_type=jnp.float32) + bso_ref[:]
    else:
        s_pre = s = None
        sem = jnp.zeros((x.shape[0], 128), jnp.float32)
    feat = ho[:, sh_pad : sh_pad + w_pad]
    sigma = ho[:, sh_pad + w_pad : sh_pad + w_pad + 1]
    inp_ch = jnp.concatenate([feat.astype(cdt), dvec], -1)
    r_pre = jnp.dot(inp_ch, wch_ref[:], preferred_element_type=jnp.float32) + bch_ref[:]
    r = jnp.maximum(r_pre, 0.0)
    rgb = jnp.dot(r.astype(cdt), wco_ref[:],
                  preferred_element_type=jnp.float32) + bco_ref[:]
    return sigma, rgb, sem, (s_pre, s, feat, inp_ch, r_pre, r)


def _field_fwd_kernel(xin_ref, wp_ref, bp_ref, hw_ref, hb_ref, wso_ref,
                      bso_ref, wch_ref, bch_ref, wco_ref, bco_ref,
                      out1_ref, sem_ref, *, layers, skips, f_pad, w_pad,
                      sh_pad, use_sem):
    x = xin_ref[:, :f_pad]
    dvec = xin_ref[:, f_pad : f_pad + 128]
    acts = _recompute_forward(x, wp_ref, bp_ref, layers, skips)
    sigma, rgb, sem, _ = _head_forward(
        x, dvec, acts, hw_ref, hb_ref, wso_ref, bso_ref, wch_ref, bch_ref,
        wco_ref, bco_ref, w_pad=w_pad, sh_pad=sh_pad, use_sem=use_sem)
    t = x.shape[0]
    out1_ref[:] = jnp.concatenate(
        [sigma, rgb[:, 0:3], jnp.zeros((t, 124), jnp.float32)], -1)
    sem_ref[:] = sem


def _field_bwd_kernel(xin_ref, g1_ref, g2_ref, wp_ref, bp_ref, hw_ref, hb_ref,
                      wso_ref, bso_ref, wch_ref, bch_ref, wco_ref, bco_ref,
                      dxin_ref, dwp_ref, dbp_ref, dhw_ref, dhb_ref, dwso_ref,
                      dbso_ref, dwch_ref, dbch_ref, dwco_ref, dbco_ref, *,
                      layers, skips, f_pad, w_pad, sh_pad, use_sem):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)
        dhw_ref[:] = jnp.zeros_like(dhw_ref)
        dhb_ref[:] = jnp.zeros_like(dhb_ref)
        dwso_ref[:] = jnp.zeros_like(dwso_ref)
        dbso_ref[:] = jnp.zeros_like(dbso_ref)
        dwch_ref[:] = jnp.zeros_like(dwch_ref)
        dbch_ref[:] = jnp.zeros_like(dbch_ref)
        dwco_ref[:] = jnp.zeros_like(dwco_ref)
        dbco_ref[:] = jnp.zeros_like(dbco_ref)

    x = xin_ref[:, :f_pad]
    dvec = xin_ref[:, f_pad : f_pad + 128]
    cdt = x.dtype
    t = x.shape[0]
    acts = _recompute_forward(x, wp_ref, bp_ref, layers, skips)
    _, _, _, (s_pre, s, feat, inp_ch, r_pre, r) = _head_forward(
        x, dvec, acts, hw_ref, hb_ref, wso_ref, bso_ref, wch_ref, bch_ref,
        wco_ref, bco_ref, w_pad=w_pad, sh_pad=sh_pad, use_sem=use_sem)

    g_sigma = g1_ref[:, 0:1]                                   # (T, 1) f32
    g_co = jnp.concatenate(
        [g1_ref[:, 1:4], jnp.zeros((t, 125), jnp.float32)], -1)  # (T, 128)

    # color branch
    r_c = r.astype(cdt)
    dwco_ref[:] += jnp.dot(r_c.T, g_co.astype(cdt),
                           preferred_element_type=jnp.float32)
    dbco_ref[:] += jnp.sum(g_co, axis=0, keepdims=True)
    g_r = jnp.dot(g_co.astype(cdt), wco_ref[:].T,
                  preferred_element_type=jnp.float32)
    g_r = g_r * (r_pre > 0.0).astype(jnp.float32)
    g_r_c = g_r.astype(cdt)
    dwch_ref[:] += jnp.dot(inp_ch.T, g_r_c, preferred_element_type=jnp.float32)
    dbch_ref[:] += jnp.sum(g_r, axis=0, keepdims=True)
    g_inp_ch = jnp.dot(g_r_c, wch_ref[:].T, preferred_element_type=jnp.float32)
    g_feat = g_inp_ch[:, :w_pad]
    g_dvec = g_inp_ch[:, w_pad : w_pad + 128]

    # semantic head
    if use_sem:
        g_sem = g2_ref[:]                                       # (T, 128)
        s_c = s.astype(cdt)
        dwso_ref[:] += jnp.dot(s_c.T, g_sem.astype(cdt),
                               preferred_element_type=jnp.float32)
        dbso_ref[:] += jnp.sum(g_sem, axis=0, keepdims=True)
        g_s = jnp.dot(g_sem.astype(cdt), wso_ref[:].T,
                      preferred_element_type=jnp.float32)
        g_s = g_s * (s_pre > 0.0).astype(jnp.float32)
        g_ho = jnp.concatenate(
            [g_s, g_feat,
             jnp.concatenate([g_sigma, jnp.zeros((t, 127), jnp.float32)], -1)],
            -1)
    else:
        g_ho = jnp.concatenate(
            [g_feat,
             jnp.concatenate([g_sigma, jnp.zeros((t, 127), jnp.float32)], -1)],
            -1)

    # combined head matmul
    h = acts[-1]
    h_c = h.astype(cdt)
    dhw_ref[:] += jnp.dot(h_c.T, g_ho.astype(cdt),
                          preferred_element_type=jnp.float32)
    dhb_ref[:] += jnp.sum(g_ho, axis=0, keepdims=True)
    g = jnp.dot(g_ho.astype(cdt), hw_ref[:].T,
                preferred_element_type=jnp.float32)              # (T, w_pad)

    # trunk backward (same math as ops/pallas_mlp_train._bwd_kernel)
    gx = jnp.zeros((t, f_pad), jnp.float32)
    for i in reversed(range(layers)):
        g = g * (acts[i] > 0.0).astype(jnp.float32)
        if i == 0:
            inp = x
        else:
            prev = acts[i - 1].astype(cdt)
            inp = jnp.concatenate([prev, x], -1) if i in skips else prev
        in_w = inp.shape[-1]
        g_c = g.astype(cdt)
        dwp_ref[i, :in_w, :] += jnp.dot(inp.T, g_c,
                                        preferred_element_type=jnp.float32)
        dbp_ref[i, 0, :] += jnp.sum(g, axis=0)
        g_inp = jnp.dot(g_c, wp_ref[i][:in_w, :].T,
                        preferred_element_type=jnp.float32)
        if i == 0:
            gx = gx + g_inp[:, :f_pad]
        elif i in skips:
            gx = gx + g_inp[:, w_pad : w_pad + f_pad]
            g = g_inp[:, :w_pad]
        else:
            g = g_inp
    dxin_ref[:] = jnp.concatenate([gx, g_dvec], -1).astype(dxin_ref.dtype)


def _pad_xin(x_enc, d_enc, f_pad, tile):
    n = x_enc.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    xin = jnp.zeros((n_pad, f_pad + 128), x_enc.dtype)
    xin = xin.at[:n, : x_enc.shape[1]].set(x_enc)
    if d_enc is not None:
        xin = xin.at[:n, f_pad : f_pad + d_enc.shape[1]].set(d_enc)
    return xin, n_pad


def _weight_specs(shapes):
    # n=len(s) binds at definition time (a bare len(s) in the lambda would
    # late-bind to the comprehension's final value).
    return [pl.BlockSpec(s, lambda i, n=len(s): (0,) * n, memory_space=pltpu.VMEM)
            for s in shapes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def field_train(xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco,
                statics, tile, interpret):
    """Fused differentiable field on packed weights.

    xin (N_pad, f_pad+128): [x_enc | dir_enc] rows; returns
    (out1 (N_pad, 128) = [sigma | rgb_logits(3) | 0...], sem (N_pad, 128)).
    `statics` is the hashable tuple from FieldDims.statics().items().
    """
    return _field_fwd_impl(xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco,
                           statics, tile, interpret)


def _field_fwd_impl(xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco,
                    statics, tile, interpret):
    st = dict(statics)
    n_pad = xin.shape[0]
    weights = (wp, bp, hw, hb, wso, bso, wch, bch, wco, bco)
    return pl.pallas_call(
        functools.partial(_field_fwd_kernel, **st),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, xin.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *_weight_specs([w.shape for w in weights]),
            ],
            out_specs=(
                pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(xin, *weights)


def _field_fwd_rule(xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco,
                    statics, tile, interpret):
    out = _field_fwd_impl(xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco,
                          statics, tile, interpret)
    return out, (xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco)


def _field_bwd_impl(xin, g1, g2, weights, statics, tile, interpret):
    """One pallas backward pass: (dxin, *dweights)."""
    st = dict(statics)
    n_pad = xin.shape[0]
    g1 = g1.astype(jnp.float32)
    g2 = g2.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_field_bwd_kernel, **st),
        out_shape=(
            jax.ShapeDtypeStruct(xin.shape, xin.dtype),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
        ),
        grid_spec=pl.GridSpec(
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, xin.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                *_weight_specs([w.shape for w in weights]),
            ],
            out_specs=(
                pl.BlockSpec((tile, xin.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *_weight_specs([w.shape for w in weights]),
            ),
        ),
        interpret=interpret,
    )(xin, g1, g2, *weights)


def _field_bwd_rule(statics, tile, interpret, res, g):
    xin, wp, bp, hw, hb, wso, bso, wch, bch, wco, bco = res
    weights = (wp, bp, hw, hb, wso, bso, wch, bch, wco, bco)
    outs = _field_bwd_impl(xin, g[0], g[1], weights, statics, tile, interpret)
    dxin = outs[0]
    dws = [dw.astype(w.dtype) for dw, w in zip(outs[1:], weights)]
    return (dxin, *dws)


field_train.defvjp(_field_fwd_rule, _field_bwd_rule)


def fused_field_apply(
    params_level: dict,
    dims: FieldDims,
    x_enc: jnp.ndarray,                 # (N, x_dim) compute dtype
    d_enc: Optional[jnp.ndarray],       # (N, d_dim) compute dtype or None
    tile: int = 256,
    interpret: bool = False,
    chunk: int = 131_072,
):
    """(sigma (N,), rgb (N, 3) post-sigmoid, sem_logits (N, C) | None)."""
    packed = pack_field(params_level, dims, x_enc.dtype)
    statics = tuple(sorted(dims.statics().items()))
    n = x_enc.shape[0]
    xin, n_pad = _pad_xin(x_enc, d_enc, dims.f_pad, tile)

    if n_pad <= chunk:
        out1, sem = field_train(xin, *packed, statics, tile, interpret)
    else:
        n_seg = _round_up(n_pad, chunk)
        if n_seg > n_pad:
            xin = jnp.concatenate(
                [xin, jnp.zeros((n_seg - n_pad, xin.shape[1]), xin.dtype)], 0)
        out1, sem = jax.lax.map(
            lambda xc: field_train(xc, *packed, statics, tile, interpret),
            xin.reshape(-1, chunk, xin.shape[1]),
        )
        out1 = out1.reshape(-1, 128)
        sem = sem.reshape(-1, 128)

    sigma = out1[:n, 0]
    rgb = jax.nn.sigmoid(out1[:n, 1:4])
    sem_logits = sem[:n, : dims.num_classes] if dims.use_sem else None
    return sigma, rgb, sem_logits


# ---------------------------------------------------------------------------
# Hybrid: XLA forward + Pallas recompute-backward.
#
# Measured on v5e at the flagship point count (tools/field_kernel_bench.py,
# 262k pts): XLA fwd 4.5 ms / bwd 11.6 ms; pure-Pallas fwd 6.3 ms (the
# lane-padded head matmuls cost ~30% extra FLOPs) / recompute-bwd 7.5 ms.
# The optimum pairs XLA's lean forward with the VMEM-resident backward:
# ~12 ms total vs 16.1 (XLA) or 13.8 (all-Pallas).
# ---------------------------------------------------------------------------


def _jnp_field_forward(x_enc, d_enc, p, dims: FieldDims):
    """Unpadded XLA forward, exactly the models/nerf.py math (dims.skips is
    already in kernel convention: layer i CONSUMES [h, x])."""
    dtype = x_enc.dtype
    h = x_enc
    for i in range(dims.layers):
        inp = x_enc if i == 0 else (
            jnp.concatenate([h, x_enc], -1) if i in dims.skips else h)
        w = p[f"trunk_{i}"]["kernel"].astype(dtype)
        b = p[f"trunk_{i}"]["bias"].astype(dtype)
        h = jnp.maximum(inp @ w + b, 0.0)
    dense = lambda name, v: (v @ p[name]["kernel"].astype(dtype)
                             + p[name]["bias"].astype(dtype))
    sigma = dense("sigma", h)[..., 0].astype(jnp.float32)
    if dims.use_sem:
        s = jnp.maximum(dense("sem_hidden", h), 0.0)
        sem = dense("sem_out", s).astype(jnp.float32)
    else:
        sem = jnp.zeros((x_enc.shape[0], dims.num_classes), jnp.float32)
    feat = dense("feature", h)
    if dims.d_dim:
        feat = jnp.concatenate([feat, d_enc.astype(dtype)], -1)
    r = jnp.maximum(dense("color_hidden", feat), 0.0)
    rgb_logit = dense("color_out", r).astype(jnp.float32)
    return sigma, rgb_logit, sem


def unpack_field_grads(dpacked, dims: FieldDims, template: dict) -> dict:
    """Exact transpose of pack_field: padded dW/db blocks -> flax leaves."""
    dwp, dbp, dhw, dhb, dwso, dbso, dwch, dbch, dwco, dbco = dpacked
    d = dims
    g = {}
    for i in range(d.layers):
        if i == 0:
            k = dwp[i][: d.x_dim, : d.width]
        elif i in d.skips:
            k = jnp.concatenate(
                [dwp[i][: d.width, : d.width],
                 dwp[i][d.w_pad : d.w_pad + d.x_dim, : d.width]], 0)
        else:
            k = dwp[i][: d.width, : d.width]
        g[f"trunk_{i}"] = {"kernel": k, "bias": dbp[i, 0, : d.width]}
    off = d.sh_pad if d.use_sem else 0
    if d.use_sem:
        g["sem_hidden"] = {"kernel": dhw[: d.width, : d.sem_hidden],
                           "bias": dhb[0, : d.sem_hidden]}
        g["sem_out"] = {"kernel": dwso[: d.sem_hidden, : d.num_classes],
                        "bias": dbso[0, : d.num_classes]}
    g["feature"] = {"kernel": dhw[: d.width, off : off + d.width],
                    "bias": dhb[0, off : off + d.width]}
    g["sigma"] = {"kernel": dhw[: d.width, off + d.w_pad : off + d.w_pad + 1],
                  "bias": dhb[0, off + d.w_pad : off + d.w_pad + 1]}
    ch_k = dwch[: d.width, : d.color_width]
    if template["color_hidden"]["kernel"].shape[0] > d.width:
        ch_k = jnp.concatenate(
            [ch_k, dwch[d.w_pad : d.w_pad + d.d_dim, : d.color_width]], 0)
    g["color_hidden"] = {"kernel": ch_k, "bias": dbch[0, : d.color_width]}
    g["color_out"] = {"kernel": dwco[: d.color_width, :3], "bias": dbco[0, :3]}
    # match the template's leaf dtypes (params are f32)
    return jax.tree.map(lambda t, v: v.astype(t.dtype),
                        {k: template[k] for k in g}, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def field_hybrid(x_enc, d_enc, params_level, dims, tile, interpret, chunk):
    """(sigma, rgb_logits, sem_logits) with XLA fwd + Pallas bwd."""
    return _jnp_field_forward(x_enc, d_enc, params_level, dims)


def _hybrid_fwd(x_enc, d_enc, params_level, dims, tile, interpret, chunk):
    out = _jnp_field_forward(x_enc, d_enc, params_level, dims)
    return out, (x_enc, d_enc, params_level)


def _hybrid_bwd(dims, tile, interpret, chunk, res, g):
    x_enc, d_enc, p = res
    g_sigma, g_rgb, g_sem = g
    n = x_enc.shape[0]
    packed = pack_field(p, dims, x_enc.dtype)
    statics = tuple(sorted(dims.statics().items()))
    xin, n_pad = _pad_xin(x_enc, d_enc if dims.d_dim else None, dims.f_pad, tile)
    g1 = jnp.zeros((n_pad, 128), jnp.float32)
    g1 = g1.at[:n, 0].set(g_sigma.astype(jnp.float32))
    g1 = g1.at[:n, 1:4].set(g_rgb.astype(jnp.float32))
    g2 = jnp.zeros((n_pad, 128), jnp.float32)
    if dims.use_sem:
        g2 = g2.at[:n, : dims.num_classes].set(g_sem.astype(jnp.float32))

    if n_pad <= chunk:
        outs = _field_bwd_impl(xin, g1, g2, packed, statics, tile, interpret)
        dxin, dpacked = outs[0], outs[1:]
    else:
        # Segment via lax.map (regalloc headroom + flat scheduler pressure);
        # per-segment weight grads sum, dxin concatenates.
        n_seg = _round_up(n_pad, chunk)
        padseg = lambda a: (jnp.concatenate(
            [a, jnp.zeros((n_seg - n_pad,) + a.shape[1:], a.dtype)], 0)
            if n_seg > n_pad else a)
        xin_s = padseg(xin).reshape(-1, chunk, xin.shape[1])
        g1_s = padseg(g1).reshape(-1, chunk, 128)
        g2_s = padseg(g2).reshape(-1, chunk, 128)
        outs = jax.lax.map(
            lambda args: _field_bwd_impl(args[0], args[1], args[2], packed,
                                         statics, tile, interpret),
            (xin_s, g1_s, g2_s),
        )
        dxin = outs[0].reshape(-1, xin.shape[1])[:n_pad]
        dpacked = [o.sum(0) for o in outs[1:]]

    dx = dxin[:n, : dims.x_dim].astype(x_enc.dtype)
    dd = dxin[:n, dims.f_pad : dims.f_pad + dims.d_dim].astype(d_enc.dtype)
    dparams = unpack_field_grads(dpacked, dims, p)
    return dx, dd, dparams


field_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def hybrid_field_apply(
    params_level: dict,
    dims: FieldDims,
    x_enc: jnp.ndarray,
    d_enc: Optional[jnp.ndarray],
    tile: int = 256,
    interpret: bool = False,
    chunk: int = 131_072,
):
    """(sigma (N,), rgb (N, 3) post-sigmoid, sem_logits (N, C) | None)."""
    if d_enc is None:
        d_enc = jnp.zeros((x_enc.shape[0], 0), x_enc.dtype)
    sigma, rgb_logit, sem = field_hybrid(x_enc, d_enc, params_level, dims,
                                         tile, interpret, chunk)
    rgb = jax.nn.sigmoid(rgb_logit[:, :3])
    return sigma, rgb, (sem if dims.use_sem else None)
