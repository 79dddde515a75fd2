#!/usr/bin/env python
"""Interleaved A/B of trunk=xla vs trunk=pallas(hybrid) full steps.
Relay RTT drifts minute-to-minute; alternating measurements cancel it."""
import dataclasses, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
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
    leafsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t)
                            if jnp.issubdtype(l.dtype, jnp.floating))

    fns = {}
    variants = [("xla", False, "trunk"), ("trunk", True, "trunk"),
                ("hybrid", True, "hybrid"), ("field", True, "field")]
    for name, flag, mode in variants:
        cfg = dataclasses.replace(base, model=dataclasses.replace(
            base.model, use_pallas=flag, pallas_mode=mode))
        step = make_train_step(cfg, model, donate=False)
        fns[name] = jax.jit(lambda st, s=step: leafsum(s(st, ds, view_ids, key)[0].params))

    rounds = int(os.environ.get("ABI_ROUNDS", "6"))
    res = {k: [] for k in fns}
    for k in fns:  # compile+warm both first
        timed(fns[k], state, iters=5, warmup=2)
    for r in range(rounds):
        for k in fns:
            res[k].append(timed(fns[k], state, iters=30, warmup=1) * 1e3)
    for k, v in res.items():
        print(f"{k:8s} median {np.median(v):7.3f} ms  runs={[round(x,2) for x in v]}", flush=True)

if __name__ == "__main__":
    main()
