"""Pallas-backed field apply (train AND eval paths).

Drop-in replacement for `PanopticNeRF.apply`: the WHOLE field — 8x256
trunk plus sigma / semantic / color heads — runs through one fused
custom-VJP Pallas kernel (ops/pallas_field_train.py) with weights and
activations pinned in VMEM, forward and backward. The field is HBM-
bandwidth-bound under XLA (~37% MXU even for the bare trunk chain,
tools/mlp_microbench.py), so eliminating the per-layer activation
round-trips is the whole game. Numerics match `model.apply` (tested).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from panopticnerf_tpu.config import ModelConfig
from panopticnerf_tpu.ops.encoding import positional_encoding


def _field_params(params: dict, level: int, has_fine: bool) -> dict:
    sub = "fine" if (level == 1 and has_fine) else "coarse"
    return params["params"][sub]


def pallas_field_apply(
    params: dict,
    cfg: ModelConfig,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    level: int = 0,
    has_fine: bool = False,
    interpret: bool = False,
    tile: int = 256,
    mode: str = "trunk",
):
    """Same signature/semantics as PanopticNeRF.__call__ (scene-normalized pts).

    Three measured execution modes (interleaved A/B on v5e, full flagship
    step, tools/ab_interleaved.py):

      "trunk"  — fused-VJP Pallas kernel for the 8x256 trunk only, heads in
                 XLA (ops/pallas_mlp_train.py). Fastest in-step.
      "hybrid" — XLA forward + whole-field recompute-in-VMEM Pallas
                 backward (ops/pallas_field_train.py). Wins in isolation
                 (12 vs 16 ms at 262k pts) but loses ~1 ms in-step: the
                 custom-call boundary blocks XLA from overlapping the field
                 backward with the compositing/loss backward.
      "field"  — all-Pallas forward+backward; the lane-padded head matmuls
                 cost ~30% extra FLOPs. Kept for kernel R&D.
    """
    p = _field_params(params, level, has_fine)
    # Small-coarse override (model.coarse_trunk_depth/width): the coarse
    # field may be a proposal-sized MLP. The fused kernels are tuned for
    # the flagship 8x256 shape; a tiny trunk gains nothing from VMEM
    # pinning, so it runs as a plain XLA chain with the same fused heads.
    from panopticnerf_tpu.models.nerf import coarse_field_cfg

    eff = coarse_field_cfg(cfg, has_fine) if level == 0 else cfg
    small_coarse = eff is not cfg
    cfg = eff
    dtype = jnp.dtype(cfg.compute_dtype)
    shape = pts.shape[:-1]
    x = pts.reshape(-1, 3)
    x_enc = positional_encoding(x, cfg.xyz_freqs).astype(dtype)

    d_enc = None
    d_dim = 0
    if cfg.use_viewdirs and viewdirs is not None:
        d = jnp.broadcast_to(viewdirs, pts.shape).reshape(-1, 3)
        d_enc = positional_encoding(d, cfg.dir_freqs).astype(dtype)
        d_dim = d_enc.shape[-1]

    # Convention shift: flax concatenates PE AFTER layer s (models/nerf.py),
    # so it is layer s+1 whose weights consume [h, x] — the kernel's skip
    # set is shifted by one.
    kernel_skips = tuple(s + 1 for s in cfg.skips if s + 1 < cfg.trunk_depth)

    if mode == "trunk" or small_coarse:
        if small_coarse:
            # XLA trunk chain, flax layer convention (skip concat AFTER
            # layer s) — matches NeRFMLP numerics exactly.
            h = x_enc
            for i in range(cfg.trunk_depth):
                h = jnp.maximum(
                    h @ p[f"trunk_{i}"]["kernel"].astype(dtype)
                    + p[f"trunk_{i}"]["bias"].astype(dtype), 0.0)
                if i in cfg.skips:
                    h = jnp.concatenate([h, x_enc], axis=-1)
        else:
            from panopticnerf_tpu.ops.pallas_mlp_train import fused_trunk_train

            weights = [p[f"trunk_{i}"]["kernel"] for i in range(cfg.trunk_depth)]
            biases = [p[f"trunk_{i}"]["bias"] for i in range(cfg.trunk_depth)]
            # tile/chunk picked by interleaved A/B on v5e (tools/ab_chunk.py):
            # 1024-pt tiles in 32,768-pt lax.map segments; see fused_trunk_train.
            h = fused_trunk_train(x_enc, weights, biases, kernel_skips,
                                  tile=max(tile, 1024), interpret=interpret).astype(dtype)
        dense = lambda name, v: (v @ p[name]["kernel"].astype(dtype)
                                 + p[name]["bias"].astype(dtype))
        # The three heads that consume h run as ONE concatenated matmul —
        # one MXU op and one read of h instead of three. Layout
        # [feature | sem_hidden | sigma] keeps every output slice 128-lane
        # aligned; padded FLOPs are identical to the separate matmuls
        # (which pad 256+128+1 -> 512 lanes anyway).
        names = ["feature"] + (["sem_hidden"] if cfg.use_semantic else []) + ["sigma"]
        w_cat = jnp.concatenate(
            [p[n]["kernel"].astype(dtype) for n in names], axis=1)
        b_cat = jnp.concatenate([p[n]["bias"].astype(dtype) for n in names])
        hw = h @ w_cat + b_cat
        wdim = cfg.trunk_width
        sigma = hw[..., -1].astype(jnp.float32)
        sem = None
        if cfg.use_semantic:
            s = jnp.maximum(hw[..., wdim : wdim + cfg.trunk_width // 2], 0.0)
            sem = dense("sem_out", s).astype(jnp.float32)
        feat = hw[..., :wdim]
        if d_enc is not None:
            # Split the concat([feat, d_enc]) @ W into two matmuls on the
            # un-concatenated operands — same math, no (N, 283) temporary.
            w_ch = p["color_hidden"]["kernel"].astype(dtype)
            pre = (feat @ w_ch[:wdim] + d_enc @ w_ch[wdim:]
                   + p["color_hidden"]["bias"].astype(dtype))
        else:
            pre = dense("color_hidden", feat)
        r = jnp.maximum(pre, 0.0)
        rgb = jax.nn.sigmoid(dense("color_out", r).astype(jnp.float32))
    else:
        from panopticnerf_tpu.ops.pallas_field_train import (
            FieldDims, fused_field_apply, hybrid_field_apply)

        dims = FieldDims(
            x_dim=x_enc.shape[-1], d_dim=d_dim, width=cfg.trunk_width,
            sem_hidden=cfg.trunk_width // 2, color_width=cfg.color_width,
            num_classes=cfg.num_classes, layers=cfg.trunk_depth,
            skips=kernel_skips, use_sem=cfg.use_semantic,
        )
        fn = hybrid_field_apply if mode == "hybrid" else fused_field_apply
        sigma, rgb, sem = fn(p, dims, x_enc, d_enc, tile=tile,
                             interpret=interpret)
    sigma = sigma.reshape(shape)
    rgb = rgb.reshape(*shape, 3)
    if sem is not None:
        sem = sem.reshape(*shape, cfg.num_classes)
    return sigma, rgb, sem


class PallasTrainAdapter:
    """Differentiable Pallas field (mode-selectable, default "trunk" — the
    in-step winner; see pallas_field_apply). Drop-in for the flax model
    everywhere a `model.apply` is expected (train AND eval); same params
    pytree, matching numerics and gradients (tested)."""

    def __init__(self, cfg_model: ModelConfig, has_fine: bool,
                 interpret: bool = False, tile: int = 256,
                 mode: str = "trunk"):
        self.cfg = cfg_model
        self.has_fine = has_fine
        self.interpret = interpret
        self.tile = tile
        self.mode = mode

    def apply(self, params, pts, viewdirs, level: int = 0):
        return pallas_field_apply(
            params, self.cfg, pts, viewdirs, level=level,
            has_fine=self.has_fine, interpret=self.interpret, tile=self.tile,
            mode=self.mode,
        )


# Kept exported for kernel R&D; the production eval path uses the plain
# flax model instead — forward-only rendering is FASTER under XLA than
# through the kernel (96.4 vs 111.7 ms/frame, tools/ab_render.py; no
# backward means the custom-call boundary buys nothing). See
# engine._eval_model.
PallasApplyAdapter = PallasTrainAdapter
