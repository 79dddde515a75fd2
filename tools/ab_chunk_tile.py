#!/usr/bin/env python
"""Interleaved A/B of fused_trunk_train lax.map segment ("chunk") sizes.

The regalloc bug that forced chunking is gone (docs/REGALLOC_RETCHECK.md),
so the segment size is a pure perf knob: the flagship fine pass is 262,144
points, i.e. 2 segments at the default 131,072. Each variant patches the
default chunk before tracing its step; the compiled programs are then
timed interleaved to cancel relay-RTT drift.
"""
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
    import panopticnerf_tpu.ops.pallas_mlp_train as pmt

    cfg = flagship_cfg()
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)
    leafsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t)
                            if jnp.issubdtype(l.dtype, jnp.floating))

    orig = pmt.fused_trunk_train
    fns = {}
    for tile, chunk in ((512, 32768), (256, 32768), (1024, 32768)):
        def patched(x, w, b, s, tile=512, interpret=False, _c=chunk, _t=tile, **kw):
            return orig(x, w, b, s, tile=_t, interpret=interpret, chunk=_c)

        pmt.fused_trunk_train = patched
        step = make_train_step(cfg, model, donate=False)
        fn = jax.jit(lambda st, s=step: leafsum(s(st, ds, view_ids, key)[0].params))
        timed(fn, state, iters=5, warmup=2)  # compile while patch is live
        fns[(tile, chunk)] = fn
    pmt.fused_trunk_train = orig

    rounds = int(os.environ.get("ABC_ROUNDS", "4"))
    res = {k: [] for k in fns}
    for _ in range(rounds):
        for k in fns:
            res[k].append(timed(fns[k], state, iters=30, warmup=1) * 1e3)
    for k, v in res.items():
        print(f"tile,chunk={str(k):16s} median {np.median(v):7.3f} ms  "
              f"runs={[round(x, 2) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
