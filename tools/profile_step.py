#!/usr/bin/env python
"""Per-stage cost breakdown of the flagship train step (VERDICT round-1 #4).

Times each pipeline stage as its own jit at the flagship shape (2048 rays,
64 coarse + 64 importance samples, 32 prims, K=16, C=19) with value-readback
sync (the only true barrier through the axon relay). Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/profile_step.py

Prints one line per stage: name, ms/call, and share of the full step.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import flagship_cfg
    from panopticnerf_tpu.data.dataset import batch_intervals, sample_ray_batch
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.ops import sampling
    from panopticnerf_tpu.ops.composite import composite as composite_fn
    from panopticnerf_tpu.ops.intersect import (
        fixed_map_from_weights, labeled_containment, samples_in_intervals,
    )
    from panopticnerf_tpu.render.renderer import SceneBounds, render_rays
    from panopticnerf_tpu.train import make_train_state, make_train_step
    from panopticnerf_tpu.train.loss import compute_losses
    from panopticnerf_tpu.utils.profiling import timed

    cfg = flagship_cfg()
    iters = int(os.environ.get("PROF_ITERS", "50"))
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    state = make_train_state(cfg, model, params)
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)

    n = cfg.data.n_rays
    s_c = cfg.render.n_samples
    s_f = s_c + cfg.render.n_importance
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)

    # Shared inputs (materialized once, outside the timed regions).
    batch = jax.jit(
        lambda k: sample_ray_batch(k, ds, view_ids, n, cfg.data.views_per_batch)
    )(key)
    iv = jax.jit(
        lambda b: batch_intervals(ds, b, cfg.render.near, cfg.render.far,
                                  cfg.data.max_intervals, cfg.data.views_per_batch)
    )(batch)
    z_c = jax.jit(
        lambda k: sampling.guided_z(k, iv, s_c, cfg.render.near, cfg.render.far,
                                    True, cfg.render.bg_sample_frac)
    )(key)
    pts_f = batch.rays_o[:, None, :] + batch.rays_d[:, None, :] * jnp.linspace(
        1.0, 30.0, s_f)[None, :, None]
    dirs = batch.rays_d[:, None, :]

    import dataclasses

    cfg_c = dataclasses.replace(cfg, render=dataclasses.replace(cfg.render, n_importance=0))

    rows = []

    def stage(name, fn, *args, **kw):
        jfn = jax.jit(fn)
        ms = timed(jfn, *args, iters=iters, warmup=2, **kw) * 1e3
        rows.append((name, ms))
        print(f"{name:34s} {ms:8.3f} ms", flush=True)
        return ms

    # --- full steps --- (return the updated param tree, NOT just the loss:
    # returning only loss_total lets XLA dead-code-eliminate the entire
    # backward+adam — measured 15 ms vs the true 33 ms step)
    leafsum = lambda tree: sum(jnp.sum(l) for l in jax.tree.leaves(tree)
                               if jnp.issubdtype(l.dtype, jnp.floating))
    step_cf = make_train_step(cfg, model, donate=False)
    t_step_cf = stage(
        "step coarse+fine (64+64)",
        lambda st: leafsum(step_cf(st, ds, view_ids, key)[0].params), state)
    # Coarse-only comparator needs its own model/state: the flagship model's
    # coarse field is proposal-sized (4x128) and the adapter only applies
    # the small-coarse cfg when a fine field exists (has_fine routing).
    from panopticnerf_tpu.models import make_network as _mk
    from panopticnerf_tpu.train import make_train_state as _ms

    model_c = _mk(cfg_c)
    state_c = _ms(cfg_c, model_c, init_params(model_c, jax.random.key(0)))
    step_c = make_train_step(cfg_c, model_c, donate=False)
    stage("step coarse-only (64, 8x256)",
          lambda st: leafsum(step_c(st, ds, view_ids, key)[0].params), state_c)

    # --- forward-only (loss, no grad) ---
    def fwd_loss(params):
        out = render_rays(model, params, batch.rays_o, batch.rays_d, bounds,
                          key, cfg, iv=iv, train=True)
        return compute_losses(out, batch, cfg)[0]

    stage("forward+loss (no grad)", fwd_loss, state.params)

    # --- MLP alone at the full fine point count (fwd / fwd+bwd) ---
    def mlp_fwd(params):
        sigma, rgb, sem = model.apply(params, pts_f, dirs, level=1)
        return sigma.sum() + rgb.sum() + sem.sum()

    stage(f"MLP fwd ({n}x{s_f} pts)", mlp_fwd, state.params)
    stage(f"MLP fwd+bwd ({n}x{s_f} pts)",
          lambda p: leafsum(jax.grad(mlp_fwd)(p)), state.params)
    stage("full fwd+bwd (loss grad)",
          lambda p: leafsum(jax.grad(lambda q: fwd_loss(q))(p)), state.params)

    # --- data plumbing ---
    stage("sample_ray_batch",
          lambda k: sample_ray_batch(k, ds, view_ids, n,
                                     cfg.data.views_per_batch).rays_o.sum(), key)
    stage("batch_intervals (grouped gather)",
          lambda b: batch_intervals(ds, b, cfg.render.near, cfg.render.far,
                                    cfg.data.max_intervals,
                                    cfg.data.views_per_batch).t_in.sum(), batch)
    stage("guided_z (coarse sampler)",
          lambda k: sampling.guided_z(k, iv, s_c, cfg.render.near,
                                      cfg.render.far, True,
                                      cfg.render.bg_sample_frac).sum(), key)

    # --- containment + compositing at the fine sample count ---
    z_f = jnp.sort(jnp.concatenate([z_c, z_c + 0.01], -1), -1)
    sigma0 = jnp.ones((n, s_f))
    rgb0 = jnp.full((n, s_f, 3), 0.5)
    sem0 = jnp.zeros((n, s_f, cfg.model.num_classes))

    def contain_comp(z, sigma, rgb, sem):
        inside = samples_in_intervals(z, iv)
        lab, cnt = labeled_containment(z, iv)
        out = composite_fn(sigma, rgb, z, far=cfg.render.far, sem_logits=sem,
                           inside_intervals=inside)
        fixed = fixed_map_from_weights(out.weights, lab, cnt, iv,
                                       cfg.model.num_classes)
        return out.rgb.sum() + fixed.sum() + cnt.sum()

    stage(f"containment+composite ({s_f} smp)", contain_comp, z_f, sigma0, rgb0, sem0)
    stage("containment+composite bwd",
          lambda z, s, r, se: leafsum(jax.grad(contain_comp, argnums=(1, 2, 3))(
              z, s, r, se)), z_f, sigma0, rgb0, sem0)

    # --- hierarchical resampling ---
    w0 = jnp.abs(jnp.ones((n, s_c - 2)))

    def pdf_merge(k, z, w):
        z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
        z_fine = sampling.sample_pdf(k, z_mid, w, cfg.render.n_importance, True)
        return sampling.merge_z(z, z_fine).sum()

    stage("sample_pdf + merge_z", pdf_merge, key, z_c, w0)

    print("\nshares of the coarse+fine step:")
    for name, ms in rows[2:]:
        print(f"  {name:34s} {100 * ms / t_step_cf:5.1f}%")


if __name__ == "__main__":
    main()
