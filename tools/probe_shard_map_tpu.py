#!/usr/bin/env python
"""Hardware probe: the Pallas trunk kernel inside a jax.shard_map region.

The shipped shard_map train route (parallel/step.py) only engages on
>1-device meshes, which this setup cannot provide on real hardware (one
chip). This probe builds the same manual-SPMD region over a 1-device TPU
mesh directly, validating Mosaic lowering + the custom VJP + the
axis-aware global losses on the real chip. Referenced by ROADMAP.md.

  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_shard_map_tpu.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.render.renderer import SceneBounds, render_rays
from panopticnerf_tpu.train.loss import compute_losses
from panopticnerf_tpu.data.dataset import batch_intervals, sample_ray_batch
from panopticnerf_tpu.train.step import resolve_train_model

cfg = Config()
cfg.data.synthetic_image_hw = (32, 48)
cfg.data.synthetic_num_frames = 4
cfg.data.n_rays = 512
cfg.data.views_per_batch = 4
cfg.data.max_primitives = 8
cfg.data.max_intervals = 4
cfg.model.num_classes = 19
cfg.model.use_pallas = True
cfg.render.n_samples = 16
cfg.render.n_importance = 16
cfg.render.near = 0.5
cfg.render.far = 40.0
cfg.render.use_primitives = True

mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("data",))
model = make_network(cfg)
tmodel = resolve_train_model(cfg, model)
params = init_params(model, jax.random.key(0))
ds = build_synthetic_dataset(cfg, seed=0)
bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)


def local_loss(p, dsx, b, k):
    # grouped Pallas INTERSECTION inside the region (round-3 production
    # route, parallel/step.py intersect_in_region) + the trunk kernel.
    k_loc = jax.random.fold_in(k, jax.lax.axis_index("data"))
    ivx = batch_intervals(dsx, b, cfg.render.near, cfg.render.far,
                          cfg.data.max_intervals, 4, use_pallas=True)
    out = render_rays(tmodel, p, b.rays_o, b.rays_d, bounds, k_loc, cfg,
                      iv=ivx, train=True)
    return compute_losses(out, b, cfg, axis_name="data")


@jax.jit
def step(p, key):
    kb, kr = jax.random.split(key)
    batch = sample_ray_batch(kb, ds, jnp.arange(4), cfg.data.n_rays, 4)
    ray = P("data")
    ds_specs = jax.tree.map(lambda _: P(), ds)
    smap = jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), ds_specs, type(batch)(*([ray] * len(batch))), P()),
        out_specs=P(), check_vma=False)
    (l, st), g = jax.value_and_grad(lambda q: smap(q, ds, batch, kr),
                                    has_aux=True)(p)
    gn = sum(jnp.sum(x * x) for x in jax.tree.leaves(g)) ** 0.5
    return l, gn


l, gn = step(params, jax.random.key(1))
print("shard_map+pallas(trunk+intersect) on TPU: loss", float(l),
      "gradnorm", float(gn), flush=True)
assert np.isfinite(float(l)) and float(gn) > 0
print("OK", flush=True)
