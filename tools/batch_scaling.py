#!/usr/bin/env python
"""Train-step throughput vs ray-batch size (coarse+fine, both kernels on).

With the regalloc RET_CHECK gone (docs/REGALLOC_RETCHECK.md), the Pallas
train path compiles at every batch size, so production deployments can pick
the batch that amortizes best. One jitted step per size, interleaved
timing, rays/s/chip per row.
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
    model = make_network(base)
    state = make_train_state(base, model, init_params(model, jax.random.key(0)))
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)

    # Time the jitted step directly (ds/view_ids are traced args — no outer
    # jit, which would bake the whole dataset into each executable as
    # constants); timed() syncs via value readback per the relay protocol.
    fns = {}
    for n in (2048, 4096, 8192, 16384):
        cfg = dataclasses.replace(
            base, data=dataclasses.replace(base.data, n_rays=n))
        step = make_train_step(cfg, model, donate=False)
        timed(step, state, ds, view_ids, key, iters=3, warmup=2)
        fns[n] = step

    rounds = int(os.environ.get("BS_ROUNDS", "3"))
    res = {k: [] for k in fns}
    for _ in range(rounds):
        for k in fns:
            iters = max(8, 30 * 2048 // k)
            res[k].append(
                timed(fns[k], state, ds, view_ids, key,
                      iters=iters, warmup=1) * 1e3)
    for n, v in res.items():
        ms = float(np.median(v))
        print(f"n_rays={n:6d}  {ms:8.3f} ms/step  {n / ms * 1e3:10.0f} rays/s",
              flush=True)


if __name__ == "__main__":
    main()
