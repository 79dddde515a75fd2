#!/usr/bin/env python
"""A/B the opt-in kernels at the flagship shape (VERDICT round-1 #3/#4).

Times the full train step with each kernel flag on/off:
  - render.use_pallas_intersect (fused slab+top-K, grouped train path)
  - model.use_pallas            (fused-VJP VMEM-resident trunk)

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/ab_kernels.py
"""

from __future__ import annotations

import dataclasses
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
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step
    from panopticnerf_tpu.utils.profiling import timed

    iters = int(os.environ.get("AB_ITERS", "50"))
    base = flagship_cfg()
    ds = build_synthetic_dataset(base, seed=0)
    model = make_network(base)
    state = make_train_state(base, model, init_params(model, jax.random.key(0)))
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)

    leafsum = lambda tree: sum(jnp.sum(l) for l in jax.tree.leaves(tree)
                               if jnp.issubdtype(l.dtype, jnp.floating))

    def time_step(cfg, label):
        step = make_train_step(cfg, model, donate=False)
        fn = jax.jit(lambda st: leafsum(step(st, ds, view_ids, key)[0].params))
        ms = timed(fn, state, iters=iters, warmup=2) * 1e3
        rps = cfg.data.n_rays / ms * 1e3
        print(f"{label:44s} {ms:8.3f} ms  {rps:10,.0f} rays/s", flush=True)
        return ms

    variants = []
    for pallas_int in (False, True):
        for pallas_mlp in (False, True):
            cfg = dataclasses.replace(
                base,
                render=dataclasses.replace(base.render,
                                           use_pallas_intersect=pallas_int),
                model=dataclasses.replace(base.model, use_pallas=pallas_mlp),
            )
            label = (f"intersect={'pallas' if pallas_int else 'xla':6s} "
                     f"trunk={'pallas' if pallas_mlp else 'xla'}")
            variants.append((label, cfg))

    for label, cfg in variants:
        try:
            time_step(cfg, label)
        except Exception as e:  # surface compile failures per-variant
            print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
