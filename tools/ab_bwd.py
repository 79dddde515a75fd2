#!/usr/bin/env python
"""Interleaved A/B of trunk-kernel BACKWARD formulations (full flagship step).

Variants flip trace-time switches in ops/pallas_mlp_train.py:
  transpose — round-2 baseline (explicit inp.T / W.T before the MXU dots)
  dg        — dot_general contraction dims, no operand transposes
  dg+bf16   — dg plus bf16 dW/db accumulators (halved VMEM RMW traffic)
An XLA (kernel-off) control is interleaved too. Relay RTT drifts
minute-to-minute; only interleaved comparisons are meaningful (CLAUDE.md).
"""
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
    from panopticnerf_tpu.ops import pallas_mlp_train as K

    base = flagship_cfg()
    ds = build_synthetic_dataset(base, seed=0)
    model = make_network(base)
    state = make_train_state(base, model, init_params(model, jax.random.key(0)))
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)
    leafsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t)
                            if jnp.issubdtype(l.dtype, jnp.floating))

    # (name, use_pallas, overrides on the trace-time switches). Two recorded
    # experiments share this tool (BASELINE.md round-3 A/B #1 and #2):
    # matmul-formulation arms + XLA control, then storage/tile arms.
    variants = [
        ("xla", False, {}),
        ("base", True, {}),  # shipped defaults: dg, f32 accum, f32 acts
        ("transpose", True, {"BWD_MATMUL_MODE": "transpose"}),
        ("dg_bf16dw", True, {"DW_ACCUM_BF16": True}),
        ("act_bf16", True, {"ACT_STORE_BF16": True}),
        ("tile512", True, {"BWD_TILE": 512}),
        ("tile2048", True, {"BWD_TILE": 2048}),
        ("act+t2048", True, {"ACT_STORE_BF16": True, "BWD_TILE": 2048}),
    ]
    defaults = {k: getattr(K, k) for k in
                ("BWD_MATMUL_MODE", "DW_ACCUM_BF16", "ACT_STORE_BF16", "BWD_TILE")}
    fns = {}
    for name, use_pallas, over in variants:
        for k, v in defaults.items():
            setattr(K, k, over.get(k, v))
        cfg = dataclasses.replace(base, model=dataclasses.replace(
            base.model, use_pallas=use_pallas))
        step = make_train_step(cfg, model, donate=False)
        f = jax.jit(lambda st, s=step: leafsum(s(st, ds, view_ids, key)[0].params))
        try:
            timed(f, state, iters=5, warmup=2)  # compile under the right flags
        except Exception as e:  # e.g. VMEM OOM at large backward tiles
            print(f"{name:10s} SKIPPED: {str(e).splitlines()[0][:120]}", flush=True)
            continue
        fns[name] = f
    for k, v in defaults.items():
        setattr(K, k, v)

    rounds = int(os.environ.get("ABI_ROUNDS", "6"))
    res = {k: [] for k in fns}
    for r in range(rounds):
        for k in fns:
            res[k].append(timed(fns[k], state, iters=30, warmup=1) * 1e3)
    for k, v in res.items():
        print(f"{k:10s} median {np.median(v):7.3f} ms  runs={[round(x, 2) for x in v]}",
              flush=True)


if __name__ == "__main__":
    main()
