"""Volume renderer: the fused hot path.

Reference: `Renderer.render` in [pn] lib/networks/renderer/panopticnerf.py
(unverified — SURVEY.md §3.1) chunks rays in a Python loop on device. Here
`render_rays` is a pure jit-able function over a whole (sharded) ray batch:
guided/stratified sampling -> (optional hierarchical fine pass) -> MLP ->
compositing, with zero host round-trips. Full-image rendering tiles the ray
axis with `lax.map` inside one jit (`render_image_rays`), so arbitrary image
sizes render with a single compile per tile shape.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.ops import sampling
from panopticnerf_tpu.ops.composite import composite as composite_fn
from panopticnerf_tpu.ops.intersect import (
    RayIntervals,
    fixed_map_from_weights,
    labeled_containment,
    samples_in_intervals,
)


class SceneBounds(NamedTuple):
    """Scene normalization applied before positional encoding."""

    center: jnp.ndarray  # (3,)
    scale: jnp.ndarray   # () — world-to-unit multiplier


class RenderOut(NamedTuple):
    rgb: jnp.ndarray                 # (N, 3)
    depth: jnp.ndarray               # (N,)
    acc: jnp.ndarray                 # (N,)
    sem_logits: Optional[jnp.ndarray]    # (N, C) learned field, composited
    sem_fixed: Optional[jnp.ndarray]     # (N, C) fixed field, composited
    inst_mass: Optional[jnp.ndarray]     # (N, K) per-interval opacity mass
    inst_ids: Optional[jnp.ndarray]      # (N, K) interval instance ids
    inst_sem: Optional[jnp.ndarray]      # (N, K) interval semantic ids
    # training extras (coarse outputs + per-sample tensors for 3D losses)
    coarse: Optional[Any] = None         # RenderOut of the coarse pass
    z: Optional[jnp.ndarray] = None              # (N, S)
    weights: Optional[jnp.ndarray] = None        # (N, S)
    sample_sem_logits: Optional[jnp.ndarray] = None  # (N, S, C)
    sample_inside_k: Optional[jnp.ndarray] = None    # (N, S, K) labeled containment
    sample_cnt: Optional[jnp.ndarray] = None         # (N, S) labeled prims/sample


def _query(model, params, pts_world, viewdirs, bounds: SceneBounds, level: int):
    pts = (pts_world - bounds.center) * bounds.scale
    return model.apply(params, pts, viewdirs, level=level)


def _composite_level(
    model, params, rays_o, rays_d, z, bounds, far, level, iv, num_classes,
    white_bkgd, noise_key=None, raw_noise_std=0.0, delta=None,
):
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]     # (N, S, 3)
    dirs = rays_d[:, None, :]
    sigma, rgb, sem = _query(model, params, pts, dirs, bounds, level)
    if noise_key is not None and raw_noise_std > 0:
        # Classic NeRF density-noise regularizer (reference raw_noise_std).
        sigma = sigma + raw_noise_std * jax.random.normal(noise_key, sigma.shape)

    inside_iv = None
    inside_lab = None
    cnt = None
    if iv is not None:
        inside_iv = samples_in_intervals(z, iv)
        inside_lab, cnt = labeled_containment(z, iv)

    out = composite_fn(
        sigma, rgb, z, far=far,
        sem_logits=sem, inside_intervals=inside_iv,
        white_bkgd=white_bkgd, delta=delta,
    )
    if iv is not None:
        # Composite the fixed field K-factored — no (N, S, C) tensors.
        fixed_map = fixed_map_from_weights(out.weights, inside_lab, cnt, iv, num_classes)
        out = out._replace(sem_fixed=fixed_map)
    return out, sem, inside_lab, cnt


def render_rays(
    model,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bounds: SceneBounds,
    key: jax.Array,
    cfg: Config,
    iv: Optional[RayIntervals] = None,
    train: bool = True,
) -> RenderOut:
    """Render a batch of rays. All cfg-derived values are Python statics
    (baked into the jit); rays/intervals/bounds are traced.
    """
    rc = cfg.render
    n = rays_o.shape[0]
    num_classes = cfg.model.num_classes
    perturb = rc.perturb and train
    k_coarse, k_fine, k_nc, k_nf = jax.random.split(key, 4)
    noise = rc.raw_noise_std if train else 0.0

    # --- coarse depths ---
    if iv is not None and rc.use_primitives:
        z = sampling.guided_z(k_coarse, iv, rc.n_samples, rc.near, rc.far, perturb, rc.bg_sample_frac)
    else:
        z = sampling.stratified_z(k_coarse, n, rc.n_samples, rc.near, rc.far, perturb)

    out_c, sem_c, lab_c, cnt_c = _composite_level(
        model, params, rays_o, rays_d, z, bounds, rc.far, 0, iv, num_classes,
        rc.white_bkgd, noise_key=k_nc, raw_noise_std=noise,
    )

    def pack(out, sem_samples, inside_k, cnt, z_used, coarse=None):
        return RenderOut(
            rgb=out.rgb, depth=out.depth, acc=out.acc,
            sem_logits=out.sem_logits, sem_fixed=out.sem_fixed,
            inst_mass=out.inst_mass,
            inst_ids=iv.instance if iv is not None else None,
            inst_sem=iv.semantic if iv is not None else None,
            coarse=coarse, z=z_used, weights=out.weights,
            sample_sem_logits=sem_samples, sample_inside_k=inside_k,
            sample_cnt=cnt,
        )

    if rc.n_importance <= 0:
        return pack(out_c, sem_c, lab_c, cnt_c, z)

    # --- hierarchical fine pass ---
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])                      # (N, S-1) bin edges
    w_interior = lax.stop_gradient(out_c.weights[:, 1:-1])    # (N, S-2) bin masses
    z_fine = sampling.sample_pdf(k_fine, z_mid, w_interior, rc.n_importance, perturb)
    z_all = sampling.merge_z(z, z_fine)

    delta_f = None
    if not train and 0 < rc.eval_keep_samples < z_all.shape[1]:
        # Forward-only top-M truncation: the fine field queries only the
        # samples with coarse-weight support (static-shape early
        # termination / empty-space culling — see topm_eval_select).
        z_all, delta_f = sampling.topm_eval_select(
            z_all, z_mid, w_interior, rc.eval_keep_samples)

    out_f, sem_f, lab_f, cnt_f = _composite_level(
        model, params, rays_o, rays_d, z_all, bounds, rc.far, 1, iv, num_classes,
        rc.white_bkgd, noise_key=k_nf, raw_noise_std=noise, delta=delta_f,
    )
    coarse = pack(out_c, sem_c, lab_c, cnt_c, z)
    return pack(out_f, sem_f, lab_f, cnt_f, z_all, coarse=coarse)


def eval_render_cfg(cfg: Config) -> Config:
    """Config used by full-image eval/visualize renders: applies the
    eval-specific sample counts (render.eval_n_samples / eval_n_importance;
    0 / -1 = follow training). The render is MLP-bound, so FPS scales with
    points per ray; quality impact is measured in BASELINE.md."""
    import dataclasses

    rc = cfg.render
    ns = rc.eval_n_samples if rc.eval_n_samples > 0 else rc.n_samples
    ni = rc.eval_n_importance if rc.eval_n_importance >= 0 else rc.n_importance
    mc = cfg.model
    if (ni <= 0 < rc.n_importance
            and (mc.coarse_trunk_depth or mc.coarse_trunk_width)):
        # With a proposal-sized coarse field (model.coarse_trunk_depth/
        # width), a coarse-only eval would render from the deliberately
        # low-capacity proposal MLP — a silent quality collapse. Refuse.
        raise ValueError(
            "render.eval_n_importance 0 renders the COARSE field only, but "
            "model.coarse_trunk_depth/width configure a small proposal "
            "coarse whose only trained role is importance weights. Use "
            "eval_n_importance > 0 (fine-field eval) or unset the proposal "
            "coarse size.")
    if (ns, ni) == (rc.n_samples, rc.n_importance):
        return cfg
    return dataclasses.replace(
        cfg, render=dataclasses.replace(rc, n_samples=ns, n_importance=ni))


def render_image_rays(
    model, params, rays_o, rays_d, bounds, cfg: Config,
    iv: Optional[RayIntervals] = None,
):
    """Full-image render: pad rays to a tile multiple and lax.map over tiles.

    Stays inside one jit for any image size with a single compile per tile
    shape (SURVEY.md §5.7). Returns a RenderOut with leading dim = n_rays.
    """
    cfg = eval_render_cfg(cfg)
    tile = cfg.render.ray_tile
    n = rays_o.shape[0]
    n_pad = (-n) % tile
    pad = lambda a: jnp.concatenate([a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)], 0) if n_pad else a
    ro, rd = pad(rays_o), pad(rays_d)
    if iv is not None:
        iv_p = RayIntervals(*[pad(x) for x in iv])
        iv_tiles = RayIntervals(*[x.reshape(-1, tile, *x.shape[1:]) for x in iv_p])
    ro_t = ro.reshape(-1, tile, 3)
    rd_t = rd.reshape(-1, tile, 3)

    def one_tile(args):
        if iv is not None:
            o, d, iv_t = args
        else:
            o, d = args
            iv_t = None
        out = render_rays(
            model, params, o, d, bounds, jax.random.key(0), cfg, iv=iv_t, train=False
        )
        # Drop per-sample training extras to keep memory flat across tiles.
        return out._replace(coarse=None, z=None, weights=None,
                            sample_sem_logits=None, sample_inside_k=None,
                            sample_cnt=None)

    args = (ro_t, rd_t, iv_tiles) if iv is not None else (ro_t, rd_t)
    outs = lax.map(one_tile, args)
    unpad = lambda a: None if a is None else a.reshape(-1, *a.shape[2:])[:n]
    return RenderOut(*[unpad(x) if isinstance(x, jnp.ndarray) else None for x in outs])
