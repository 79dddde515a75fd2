#!/usr/bin/env python
"""Interleaved A/B of full-coarse vs small-coarse (proposal) train steps.

Each variant owns its model/params/step (the param trees differ); the
flagship shape and kernel flags come from bench.flagship_cfg. Relay RTT
drifts minute-to-minute, so only alternating measurements are comparable.

  ABC_VARIANTS="8x256,4x128,4x64" ABC_ROUNDS=6 python tools/ab_coarse.py
"""
import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    base = flagship_cfg()
    ds = build_synthetic_dataset(base, seed=0)
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)
    leafsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t)
                            if jnp.issubdtype(l.dtype, jnp.floating))

    names = os.environ.get("ABC_VARIANTS", "8x256,4x128,4x64").split(",")
    fns = {}
    for name in names:
        d, w = name.split("x")
        d, w = int(d), int(w)
        full = (d == base.model.trunk_depth and w == base.model.trunk_width)
        cfg = dataclasses.replace(base, model=dataclasses.replace(
            base.model,
            coarse_trunk_depth=0 if full else d,
            coarse_trunk_width=0 if full else w))
        model = make_network(cfg)
        state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
        step = make_train_step(cfg, model, donate=False)
        fns[name] = jax.jit(
            lambda st, s=step: leafsum(s(st, ds, view_ids, key)[0].params)
        ), state

    rounds = int(os.environ.get("ABC_ROUNDS", "6"))
    res = {k: [] for k in fns}
    for k, (fn, st) in fns.items():  # compile+warm all first
        timed(fn, st, iters=5, warmup=2)
        print(f"{k}: warmed", flush=True)
    for _ in range(rounds):
        for k, (fn, st) in fns.items():
            res[k].append(timed(fn, st, iters=30, warmup=1) * 1e3)
    n_rays = base.data.n_rays
    for k, v in res.items():
        med = float(np.median(v))
        print(f"coarse {k:7s} median {med:7.3f} ms  {n_rays / med * 1e3:9.0f} rays/s"
              f"  runs={[round(x, 2) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
