#!/usr/bin/env python
"""Interleaved A/B of the full-image eval render: field-execution mode x
ray-tile size. The eval path is forward-only, so the whole-field Pallas
forward ("field" mode) has no custom-call-boundary backward-overlap penalty
— the in-step loser may win here. Also probes ray_tile (lax.map tile).
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
    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.ops import intersect_rays
    from panopticnerf_tpu.render import SceneBounds, render_image_rays
    from panopticnerf_tpu.train.step import resolve_train_model
    from panopticnerf_tpu.utils.profiling import timed

    base = flagship_cfg()
    ds = build_synthetic_dataset(base, seed=0)
    flax_model = make_network(base)
    params = init_params(flax_model, jax.random.key(0))
    o, d = view_rays(ds, 0)
    iv = intersect_rays(o, d, view_primitives(ds, 0), base.render.near,
                        base.render.far, base.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)

    fns = {}
    # (name, use_pallas, mode, tile, eval_ns, eval_ni)
    variants = [("xla", False, "trunk", 4096, 0, -1),
                ("trunk", True, "trunk", 4096, 0, -1),
                ("xla_8k", False, "trunk", 8192, 0, -1)]
    if os.environ.get("ABR_ALL"):
        variants += [("field", True, "field", 4096, 0, -1),
                     ("trunk_8k", True, "trunk", 8192, 0, -1),
                     ("trunk_33k", True, "trunk", 33088, 0, -1)]
    if os.environ.get("ABR_SAMPLES"):
        # eval-sample-count sweep (render.eval_n_samples knob)
        variants = [("64+64", False, "trunk", 4096, 0, -1),
                    ("48+48", False, "trunk", 4096, 48, 48),
                    ("32+32", False, "trunk", 4096, 32, 32),
                    ("32+16", False, "trunk", 4096, 32, 16),
                    ("24+24", False, "trunk", 4096, 24, 24)]
    for name, flag, mode, tile, ens, eni in variants:
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, use_pallas=flag, pallas_mode=mode),
            render=dataclasses.replace(base.render, ray_tile=tile,
                                       eval_n_samples=ens, eval_n_importance=eni),
        )
        model = resolve_train_model(cfg, flax_model)
        fn = jax.jit(lambda p, c=cfg, m=model: render_image_rays(
            m, p, o, d, bounds, c, iv=iv).rgb)
        timed(fn, params, iters=3, warmup=2)
        fns[name] = fn

    rounds = int(os.environ.get("ABR_ROUNDS", "4"))
    res = {k: [] for k in fns}
    for _ in range(rounds):
        for k in fns:
            res[k].append(timed(fns[k], params, iters=10, warmup=1) * 1e3)
    n = o.shape[0]
    for k, v in res.items():
        ms = float(np.median(v))
        print(f"{k:10s} median {ms:8.3f} ms/frame  {1e3 / ms:6.2f} FPS  "
              f"runs={[round(x, 2) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
