"""NeRF field network with semantic head (flax).

Reference: `Network`/`NeRF` in [pn] lib/networks/panopticnerf/network.py
(unverified — SURVEY.md §2.2): frequency PE (10 xyz / 4 dir), 8x256 trunk
with a skip at layer 4 -> sigma + feature; view-dependent color branch
(feature ⊕ dir PE -> 128 -> rgb); view-independent semantic head; separate
coarse/fine instances for hierarchical sampling.

TPU design: the MLP is a stack of (S*N, width) matmuls — ideal MXU shape when
rays*samples per device is >= a few thousand. Matmuls run in bfloat16
(param_dtype stays float32) via flax's dtype split; outputs are promoted to
f32 before compositing. All shapes static.
"""

from __future__ import annotations

from typing import Optional


import flax.linen as nn
import jax.numpy as jnp

from panopticnerf_tpu.config import ModelConfig
from panopticnerf_tpu.ops.encoding import positional_encoding


def coarse_field_cfg(cfg: ModelConfig, has_fine: bool) -> ModelConfig:
    """Effective config of the COARSE field: identical to `cfg` unless the
    small-coarse override (model.coarse_trunk_depth/width) is set and a fine
    field exists — then the coarse trunk shrinks to the proposal size and
    skip indices past the new depth are dropped."""
    import dataclasses

    if not has_fine or not (cfg.coarse_trunk_depth or cfg.coarse_trunk_width):
        return cfg
    depth = cfg.coarse_trunk_depth or cfg.trunk_depth
    width = cfg.coarse_trunk_width or cfg.trunk_width
    return dataclasses.replace(
        cfg, trunk_depth=depth, trunk_width=width,
        skips=tuple(s for s in cfg.skips if s < depth - 1),
        color_width=min(cfg.color_width, width),
    )


class NeRFMLP(nn.Module):
    """One radiance+semantics field (used for both coarse and fine)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, pts: jnp.ndarray, viewdirs: Optional[jnp.ndarray]):
        """pts: (..., 3) scene-normalized positions; viewdirs: (..., 3) unit.

        Returns (sigma (...,), rgb (..., 3), sem_logits (..., C) | None),
        all float32.
        """
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        dense = lambda w, name: nn.Dense(w, dtype=dtype, param_dtype=jnp.float32, name=name)

        x_enc = positional_encoding(pts, c.xyz_freqs).astype(dtype)
        h = x_enc
        for i in range(c.trunk_depth):
            h = nn.relu(dense(c.trunk_width, f"trunk_{i}")(h))
            if i in c.skips:  # classic NeRF: re-inject PE after skip layer
                h = jnp.concatenate([h, x_enc], axis=-1)

        sigma = dense(1, "sigma")(h)[..., 0].astype(jnp.float32)

        sem_logits = None
        if c.use_semantic:
            # View-independent semantics (labels must not vary with viewpoint).
            s = nn.relu(dense(c.trunk_width // 2, "sem_hidden")(h))
            sem_logits = dense(c.num_classes, "sem_out")(s).astype(jnp.float32)

        feat = dense(c.trunk_width, "feature")(h)
        if c.use_viewdirs and viewdirs is not None:
            d_enc = positional_encoding(viewdirs, c.dir_freqs).astype(dtype)
            d_enc = jnp.broadcast_to(d_enc, feat.shape[:-1] + (d_enc.shape[-1],))
            feat = jnp.concatenate([feat, d_enc], axis=-1)
        r = nn.relu(dense(c.color_width, "color_hidden")(feat))
        rgb = nn.sigmoid(dense(3, "color_out")(r)).astype(jnp.float32)
        return sigma, rgb, sem_logits


class PanopticNeRF(nn.Module):
    """Coarse(+fine) field pair, mirroring the reference's hierarchy.

    `level` selects the field: 0 = coarse, 1 = fine. The fine field exists
    only when `has_fine`; with hierarchical sampling off, the coarse field is
    the flagship model.
    """

    cfg: ModelConfig
    has_fine: bool = False

    def setup(self):
        self.coarse = NeRFMLP(coarse_field_cfg(self.cfg, self.has_fine))
        if self.has_fine:
            self.fine = NeRFMLP(self.cfg)

    def __call__(self, pts, viewdirs, level: int = 0):
        if level == 1 and self.has_fine:
            return self.fine(pts, viewdirs)
        return self.coarse(pts, viewdirs)

    def init_all(self, pts, viewdirs):
        """Touch every submodule so `init` materializes coarse AND fine params."""
        out = self.coarse(pts, viewdirs)
        if self.has_fine:
            out = self.fine(pts, viewdirs)
        return out
