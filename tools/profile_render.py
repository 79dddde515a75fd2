#!/usr/bin/env python
"""Per-stage cost breakdown of the EVAL render path (VERDICT round-3 #2).

The full-image render lax.maps render_rays over ray_tile-sized tiles
(render.renderer.render_image_rays); per-frame cost is therefore
(per-tile cost) x (n_tiles). This times each eval-path stage as its own
jit at ONE tile shape (ray_tile rays, eval sample counts, flagship model)
and reports the per-frame attribution at 376x1408 (529,408 rays), the
KITTI-360 rectified shape the reference's visualize path renders
([pn] lib/visualizers/panopticnerf.py — unverified, SURVEY.md §2.2).

Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/profile_render.py

Env: PR_TILE (default render.ray_tile), PR_KEEP (eval_keep_samples,
default 0), PR_ITERS (default 30).
"""

from __future__ import annotations

import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FULLRES_RAYS = 376 * 1408


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import flagship_cfg
    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.ops import intersect_rays, sampling
    from panopticnerf_tpu.ops.composite import composite as composite_fn
    from panopticnerf_tpu.ops.intersect import (
        fixed_map_from_weights, labeled_containment, samples_in_intervals,
    )
    from panopticnerf_tpu.render.renderer import SceneBounds, render_rays
    from panopticnerf_tpu.train.step import resolve_train_model
    from panopticnerf_tpu.utils.profiling import timed

    cfg = flagship_cfg()
    tile = int(os.environ.get("PR_TILE", str(cfg.render.ray_tile)))
    keep = int(os.environ.get("PR_KEEP", "0"))
    iters = int(os.environ.get("PR_ITERS", "30"))
    cfg = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, eval_keep_samples=keep))

    ds = build_synthetic_dataset(cfg, seed=0)
    flax_model = make_network(cfg)
    params = init_params(flax_model, jax.random.key(0))
    model = resolve_train_model(cfg, flax_model)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)

    # One tile of real rays + precomputed intervals (as render_image_rays
    # receives them).
    o_all, d_all = view_rays(ds, 0)
    o, d = o_all[:tile], d_all[:tile]
    iv = intersect_rays(o, d, view_primitives(ds, 0), cfg.render.near,
                        cfg.render.far, cfg.data.max_intervals)

    s_c = cfg.render.n_samples
    s_merge = s_c + cfg.render.n_importance
    s_f = keep if 0 < keep < s_merge else s_merge
    n_tiles = -(-FULLRES_RAYS // tile)
    key = jax.random.key(0)

    rows = []

    def stage(name, fn, *args):
        jfn = jax.jit(fn)
        ms = timed(jfn, *args, iters=iters, warmup=2) * 1e3
        rows.append((name, ms))
        print(f"{name:36s} {ms:8.3f} ms/tile  {ms * n_tiles:8.1f} ms/frame",
              flush=True)
        return ms

    # --- the real thing: one full eval tile ---
    t_full = stage(
        "render_rays eval tile (full)",
        lambda p: render_rays(model, p, o, d, bounds, key, cfg, iv=iv,
                              train=False).rgb.sum(), params)

    # --- MLP floors ---
    pts_f = o[:, None, :] + d[:, None, :] * jnp.linspace(
        1.0, 30.0, s_f)[None, :, None]
    dirs = d[:, None, :]

    def mlp_fine(p):
        sigma, rgb, sem = model.apply(p, pts_f, dirs, level=1)
        return sigma.sum() + rgb.sum() + sem.sum()

    stage(f"fine MLP fwd ({tile}x{s_f} pts)", mlp_fine, params)

    pts_c = pts_f[:, :s_c]

    def mlp_coarse(p):
        sigma, rgb, sem = model.apply(p, pts_c, dirs, level=0)
        return sigma.sum() + rgb.sum() + sem.sum()

    stage(f"coarse MLP fwd ({tile}x{s_c} pts)", mlp_coarse, params)

    # --- samplers ---
    stage("guided_z (coarse sampler)",
          lambda k: sampling.guided_z(k, iv, s_c, cfg.render.near,
                                      cfg.render.far, False,
                                      cfg.render.bg_sample_frac).sum(), key)

    z_c = jax.jit(lambda k: sampling.guided_z(
        k, iv, s_c, cfg.render.near, cfg.render.far, False,
        cfg.render.bg_sample_frac))(key)
    w0 = jnp.abs(jnp.ones((tile, s_c - 2))) * 0.1

    def pdf_merge(k, z, w):
        z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
        z_fine = sampling.sample_pdf(k, z_mid, w, cfg.render.n_importance,
                                     False)
        return sampling.merge_z(z, z_fine).sum()

    stage("sample_pdf + merge_z", pdf_merge, key, z_c, w0)

    z_merged = jnp.sort(jnp.concatenate([z_c, z_c + 0.01], -1), -1)
    if 0 < keep < s_merge:
        def topm(z, w):
            z_mid = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
            zs, dl = sampling.topm_eval_select(z, z_mid, w, keep)
            return zs.sum() + dl.sum()

        stage(f"topm_eval_select (keep {keep})", topm, z_merged, w0)
        z_eval = z_merged[:, :keep]
    else:
        z_eval = z_merged

    # --- containment + compositing at the eval sample count ---
    sigma0 = jnp.ones((tile, s_f))
    rgb0 = jnp.full((tile, s_f, 3), 0.5)
    sem0 = jnp.zeros((tile, s_f, cfg.model.num_classes))

    def contain_comp(z, sigma, rgb, sem):
        inside = samples_in_intervals(z, iv)
        lab, cnt = labeled_containment(z, iv)
        out = composite_fn(sigma, rgb, z, far=cfg.render.far, sem_logits=sem,
                           inside_intervals=inside)
        fixed = fixed_map_from_weights(out.weights, lab, cnt, iv,
                                       cfg.model.num_classes)
        return out.rgb.sum() + fixed.sum() + cnt.sum()

    t_cc = stage(f"containment+composite ({s_f} smp)",
                 contain_comp, z_eval, sigma0, rgb0, sem0)

    def contain_only(z):
        inside = samples_in_intervals(z, iv)
        lab, cnt = labeled_containment(z, iv)
        return inside.sum() + lab.sum() + cnt.sum()

    stage(f"containment only ({s_f} smp)", contain_only, z_eval)

    def composite_only(z, sigma, rgb, sem):
        out = composite_fn(sigma, rgb, z, far=cfg.render.far, sem_logits=sem)
        return out.rgb.sum() + out.sem_logits.sum()

    stage(f"composite only ({s_f} smp)", composite_only,
          z_eval, sigma0, rgb0, sem0)

    print(f"\ntile {tile}, keep {keep or 'off'}, {n_tiles} tiles/frame; "
          f"full tile = {t_full:.3f} ms -> "
          f"{t_full * n_tiles:.1f} ms/frame "
          f"({1e3 / (t_full * n_tiles):.3f} FPS device-only)")
    print("shares of the full eval tile:")
    for name, ms in rows[1:]:
        print(f"  {name:36s} {100 * ms / t_full:5.1f}%")


if __name__ == "__main__":
    main()
