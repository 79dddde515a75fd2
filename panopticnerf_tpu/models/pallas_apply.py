"""Pallas-backed forward path for the NeRF field.

Drop-in replacement for `PanopticNeRF.apply` on the inference/render path:
the trunk (the FLOP-dominant 8x256 stack) runs through the fused Pallas
kernel (weights pinned in VMEM, zero inter-layer HBM traffic); the small
heads (sigma / semantics / color) stay jnp, where XLA fuses them with the
compositing consumers. Numerics match `model.apply` (tested).
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
    tile: int = 512,
):
    """Same signature/semantics as PanopticNeRF.__call__ (scene-normalized pts)."""
    p = _field_params(params, level, has_fine)
    dtype = jnp.dtype(cfg.compute_dtype)
    shape = pts.shape[:-1]
    x = pts.reshape(-1, 3)

    x_enc = positional_encoding(x, cfg.xyz_freqs).astype(dtype)
    weights = [p[f"trunk_{i}"]["kernel"] for i in range(cfg.trunk_depth)]
    biases = [p[f"trunk_{i}"]["bias"] for i in range(cfg.trunk_depth)]
    # Convention shift: flax concatenates PE AFTER layer s (models/nerf.py),
    # so it is layer s+1 whose weights consume [h, x] — the kernel's skip
    # set is shifted by one.
    kernel_skips = tuple(s + 1 for s in cfg.skips if s + 1 < cfg.trunk_depth)
    # jnp-packed kernel (traceable under jit, unlike the host-packed
    # fused_trunk); the custom-VJP forward is identical math.
    from panopticnerf_tpu.ops.pallas_mlp_train import fused_trunk_train

    h = fused_trunk_train(x_enc, weights, biases, kernel_skips, tile=tile,
                          interpret=interpret).astype(dtype)

    dense = lambda name, v: (v @ p[name]["kernel"].astype(dtype)
                             + p[name]["bias"].astype(dtype))
    sigma = dense("sigma", h)[..., 0].astype(jnp.float32).reshape(shape)

    sem = None
    if cfg.use_semantic:
        s = jnp.maximum(dense("sem_hidden", h), 0.0)
        sem = dense("sem_out", s).astype(jnp.float32).reshape(*shape, cfg.num_classes)

    feat = dense("feature", h)
    if cfg.use_viewdirs and viewdirs is not None:
        d = jnp.broadcast_to(viewdirs, pts.shape).reshape(-1, 3)
        d_enc = positional_encoding(d, cfg.dir_freqs).astype(dtype)
        feat = jnp.concatenate([feat, d_enc], axis=-1)
    r = jnp.maximum(dense("color_hidden", feat), 0.0)
    rgb = jnp.asarray(
        1.0 / (1.0 + jnp.exp(-dense("color_out", r).astype(jnp.float32)))
    ).reshape(*shape, 3)
    return sigma, rgb, sem


class PallasTrainAdapter:
    """Differentiable Pallas field: fused trunk (custom VJP — activations
    never touch HBM, see ops/pallas_mlp_train.py) + jnp heads. Drop-in for
    the flax model everywhere a `model.apply` is expected (train AND eval);
    same params pytree, matching numerics and gradients (tested)."""

    def __init__(self, cfg_model: ModelConfig, has_fine: bool,
                 interpret: bool = False, tile: int = 512):
        self.cfg = cfg_model
        self.has_fine = has_fine
        self.interpret = interpret
        self.tile = tile

    def apply(self, params, pts, viewdirs, level: int = 0):
        return pallas_field_apply(
            params, self.cfg, pts, viewdirs, level=level,
            has_fine=self.has_fine, interpret=self.interpret, tile=self.tile,
        )


# The render/eval path uses the same adapter (the custom-VJP forward is the
# fused forward kernel).
PallasApplyAdapter = PallasTrainAdapter
