"""Data-parallel train step over a device mesh (pjit/GSPMD).

One jit serves the whole slice: the on-device ray batch is sharded along the
`data` mesh axis via a sharding constraint; params/optimizer state stay
replicated, so XLA lowers the gradient reduction to a psum over ICI —
exactly the scaling-book recipe (annotate shardings, let XLA insert
collectives). Host loop is unchanged vs the single-chip path.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.dataset import DeviceDataset, batch_intervals, sample_ray_batch
from panopticnerf_tpu.parallel.mesh import replicated
from panopticnerf_tpu.render.renderer import SceneBounds, render_rays
from panopticnerf_tpu.train.loss import compute_losses
from panopticnerf_tpu.train.step import (TrainState, ema_update,
                                         resolve_train_model,
                                         weight_th_schedule)


def make_parallel_train_step(cfg: Config, model, mesh: Mesh, donate: bool = True):
    """(state, ds, view_ids, key) -> (state, stats), rays sharded over `mesh`.

    n_rays must divide evenly by the mesh size (static check).
    """
    use_shard_map = False
    intersect_in_region = False
    g = cfg.data.views_per_batch
    if mesh.devices.size > 1 and (cfg.model.use_pallas
                                  or cfg.render.use_pallas_intersect):
        # Pallas custom calls under GSPMD auto-sharding are at best
        # replicated behind all-gathers (negating data parallelism), so
        # they never run under automatic sharding here. Two routes:
        #   kernel_shard_map=True (default): the render+loss region runs
        #     under jax.shard_map — manual SPMD, each device applies the
        #     fused kernels to its local ray shard; losses/stats are exact
        #     global masked means (psum inside compute_losses), so numerics
        #     match the single-device step. The grouped INTERSECTION kernel
        #     also moves inside the region when the ray sharding respects
        #     view-group boundaries: each device owns whole groups
        #     (G % n_dev == 0) or a slice of a single group
        #     (n_dev % G == 0), making the grouped reshape local.
        #   kernel_shard_map=False: force the XLA paths (legacy).
        use_shard_map = cfg.parallel.kernel_shard_map and cfg.model.use_pallas
        if cfg.render.use_pallas_intersect:
            nd = mesh.devices.size
            group_ok = g > 0 and (g % nd == 0 or nd % g == 0)
            if (cfg.parallel.kernel_shard_map and group_ok
                    and cfg.render.use_primitives):
                intersect_in_region = True
                use_shard_map = True
            else:
                warnings.warn(
                    "multi-device mesh: Pallas intersection kernel disabled "
                    "(XLA interval path used; numerics identical). To keep "
                    "it on, use parallel.kernel_shard_map with grouped "
                    "batches whose data.views_per_batch divides (or is a "
                    "multiple of) the mesh size.",
                    stacklevel=2)
                cfg = dataclasses.replace(
                    cfg, render=dataclasses.replace(
                        cfg.render, use_pallas_intersect=False))
        if cfg.model.use_pallas and not cfg.parallel.kernel_shard_map:
            warnings.warn(
                "multi-device mesh: Pallas field kernel disabled "
                "(parallel.kernel_shard_map False; XLA field used).",
                stacklevel=2)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, use_pallas=False))
    model = resolve_train_model(cfg, model)
    if cfg.data.views_per_batch > 0 and cfg.data.n_rays % cfg.data.views_per_batch:
        raise ValueError(
            f"data.n_rays={cfg.data.n_rays} must be divisible by "
            f"data.views_per_batch={cfg.data.views_per_batch}"
        )
    axis = cfg.parallel.mesh_axis_name
    n_dev = mesh.devices.size
    if cfg.data.n_rays % n_dev != 0:
        raise ValueError(
            f"data.n_rays={cfg.data.n_rays} must be divisible by mesh size {n_dev}"
        )
    use_prims = cfg.render.use_primitives
    use_pallas_intersect = (
        cfg.render.use_pallas_intersect and cfg.data.views_per_batch > 0
        and not intersect_in_region
    )
    g_local = max(1, g // mesh.devices.size) if g > 0 else 0
    pallas_interpret = jax.default_backend() == "cpu"
    sem_gate = cfg.train.pretrain == "nerf"
    pretrain_steps = cfg.train.pretrain_steps
    agree_start_step = int(cfg.loss.agree_start * cfg.train.max_steps)
    rays_spec = jax.sharding.NamedSharding(mesh, P(axis))

    def shard_rays(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1))))
            ),
            tree,
        )

    def step_fn(state: TrainState, ds: DeviceDataset, view_ids, key):
        key = jax.random.fold_in(key, state.step)  # see train/step.py note
        k_batch, k_render = jax.random.split(key)
        batch = sample_ray_batch(k_batch, ds, view_ids, cfg.data.n_rays,
                                 cfg.data.views_per_batch)
        batch = shard_rays(batch)
        iv = (
            shard_rays(
                batch_intervals(ds, batch, cfg.render.near, cfg.render.far,
                                cfg.data.max_intervals, cfg.data.views_per_batch,
                                use_pallas=use_pallas_intersect,
                                pallas_interpret=pallas_interpret)
            )
            if use_prims and not intersect_in_region
            else None
        )
        sem_scale = jnp.where(state.step < pretrain_steps, 0.0, 1.0) if sem_gate else 1.0
        agree_on = (
            jnp.where(state.step >= agree_start_step, 1.0, 0.0)
            if cfg.loss.agree_filter else 0.0
        )
        weight_th_t = weight_th_schedule(cfg, state.step)
        bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)

        if use_shard_map:
            # Manual-SPMD render+loss region: each device renders its local
            # ray shard (the Pallas trunk kernel never sees the mesh);
            # compute_losses(axis_name=...) makes every reduction the exact
            # global value, and shard_map's transpose psums the parameter
            # cotangents — gradients match the single-device step.
            ray = P(axis)
            b_specs = type(batch)(*([ray] * len(batch)))
            iv_specs = type(iv)(*([ray] * len(iv))) if iv is not None else None

            # scales = [sem_scale, agree_on, weight_th] as ONE replicated
            # (3,) operand so the shard_map specs stay unchanged as gates
            # are added.
            def local_loss(params, b, ivx, bnds, k_r, scales, dsx=None):
                # decorrelate per-device stratified jitter
                k_loc = jax.random.fold_in(k_r, jax.lax.axis_index(axis))
                if dsx is not None:
                    # Grouped intersection INSIDE the region: the local ray
                    # shard is whole view groups (or one group slice), so
                    # the grouped reshape is local and the Pallas kernel
                    # runs per device with views_per_batch = g_local.
                    ivx = batch_intervals(
                        dsx, b, cfg.render.near, cfg.render.far,
                        cfg.data.max_intervals, g_local,
                        use_pallas=True, pallas_interpret=pallas_interpret)
                out = render_rays(model, params, b.rays_o, b.rays_d, bnds,
                                  k_loc, cfg, iv=ivx, train=True)
                return compute_losses(out, b, cfg, sem_scale=scales[0],
                                      axis_name=axis, agree_on=scales[1],
                                      weight_th=scales[2])

            s_arr = jnp.stack([jnp.asarray(sem_scale, jnp.float32),
                               jnp.asarray(agree_on, jnp.float32),
                               jnp.asarray(weight_th_t, jnp.float32)])
            if intersect_in_region:
                ds_specs = jax.tree.map(lambda _: P(), ds)
                smap = jax.shard_map(
                    lambda p, dsx, b, bnds, k_r, ss: local_loss(
                        p, b, None, bnds, k_r, ss, dsx=dsx),
                    mesh=mesh,
                    in_specs=(P(), ds_specs, b_specs, P(), P(), P()),
                    out_specs=P(), check_vma=False,
                )
                loss_fn = lambda p: smap(p, ds, batch, bounds, k_render, s_arr)
            elif iv is not None:
                smap = jax.shard_map(
                    local_loss, mesh=mesh,
                    in_specs=(P(), b_specs, iv_specs, P(), P(), P()),
                    out_specs=P(), check_vma=False,
                )
                loss_fn = lambda p: smap(p, batch, iv, bounds, k_render, s_arr)
            else:
                smap = jax.shard_map(
                    lambda p, b, bnds, k_r, ss: local_loss(p, b, None, bnds, k_r, ss),
                    mesh=mesh,
                    in_specs=(P(), b_specs, P(), P(), P()),
                    out_specs=P(), check_vma=False,
                )
                loss_fn = lambda p: smap(p, batch, bounds, k_render, s_arr)
        else:
            def loss_fn(params):
                out = render_rays(
                    model, params, batch.rays_o, batch.rays_d, bounds,
                    k_render, cfg, iv=iv, train=True,
                )
                return compute_losses(out, batch, cfg, sem_scale=sem_scale,
                                      agree_on=agree_on, weight_th=weight_th_t)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = ema_update(state.apply_gradients(grads=grads),
                               cfg.train.ema_decay)
        stats["grad_norm"] = optax.global_norm(grads)
        return new_state, stats

    repl = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
