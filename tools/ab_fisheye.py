#!/usr/bin/env python
"""Interleaved A/B of the -360 joint perspective+fisheye train step with the
Pallas kernels OFF (how configs/kitti360_360.yaml shipped through round 3)
vs ON (trunk kernel + grouped intersection kernel).

The joint stage's recorded in-loop rate (~78.5k rays/s at 4096 mixed rays)
ran kernels-off; the kernels take world rays / points, so the camera model
is irrelevant to them. Relay RTT drifts minute-to-minute — only
alternating measurements are comparable.

  ABF_ROUNDS=6 python tools/ab_fisheye.py
"""
import dataclasses
import os
import sys
import tempfile

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
    from panopticnerf_tpu.config import load_config
    from panopticnerf_tpu.data.demo_tree import write_demo_tree
    from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step
    from panopticnerf_tpu.utils.profiling import timed

    # Joint-stage shape at the hardware-record scale: 4096 mixed rays,
    # 64+64 samples, grouped views. Image size is irrelevant to step cost
    # (sampling is per-ray), so a small tree keeps synthesis cheap.
    base = load_config(os.path.join(os.path.dirname(__file__), os.pardir,
                                    "configs", "kitti360_360.yaml"))
    root = os.path.join(tempfile.gettempdir(), "abf_tree")
    if not os.path.isdir(os.path.join(root, "data_2d_raw")):
        write_demo_tree(root, n_frames=4, hw=(48, 64), n_boxes=8, seed=0,
                        fisheye=True)
    base.data.root = root
    base.data.frame_start = 0
    base.data.frame_num = 4
    base.data.ratio = 1.0
    base.data.max_primitives = 16
    base.data.max_intervals = 8
    base.render.far = 40.0
    ds = build_kitti360_dataset(base)
    assert int(np.asarray(ds.cam_model).max()) == 1, "no fisheye views"
    view_ids = jnp.arange(int(ds.images.shape[0]))
    key = jax.random.key(0)
    leafsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t)
                            if jnp.issubdtype(l.dtype, jnp.floating))

    variants = {
        "xla      ": (False, False),
        "kernels  ": (True, True),
        "trunkonly": (True, False),
    }
    fns = {}
    for name, (field_k, isect_k) in variants.items():
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, use_pallas=field_k),
            render=dataclasses.replace(base.render,
                                       use_pallas_intersect=isect_k))
        model = make_network(cfg)
        state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
        step = make_train_step(cfg, model, donate=False)
        fns[name] = (jax.jit(
            lambda st, s=step: leafsum(s(st, ds, view_ids, key)[0].params)
        ), state)

    rounds = int(os.environ.get("ABF_ROUNDS", "6"))
    res = {k: [] for k in fns}
    for k, (fn, st) in fns.items():
        timed(fn, st, iters=5, warmup=2)
        print(f"{k}: warmed", flush=True)
    for _ in range(rounds):
        for k, (fn, st) in fns.items():
            res[k].append(timed(fn, st, iters=30, warmup=1) * 1e3)
    n_rays = base.data.n_rays
    for k, v in res.items():
        med = float(np.median(v))
        print(f"joint-360 {k} median {med:7.3f} ms  {n_rays / med * 1e3:9.0f} rays/s"
              f"  runs={[round(x, 2) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
