#!/usr/bin/env python
"""Full-resolution (376x1408, the KITTI-360 rectified shape) eval-render
probe — the reference's visualize path renders test views at this size
([pn] lib/visualizers/panopticnerf.py via run.py --type visualize).

Round-2 review flagged that the repo's render FPS was only ever measured at
quarter-res (94x352) and extrapolated to full-res; this tool measures the
real thing on hardware, interleaved across variants:

  64+64        train sample counts (reference parity)
  32+32        render.eval_n_samples knob (2x study at quarter-res)
  32+32+prop   + proposal-style small coarse (4x128) placing fine samples

Env: FR_HW=h,w overrides the image size; FR_ROUNDS=n repeats.
Timing: value readback is the only true sync through the axon relay
(CLAUDE.md) — handled by utils.profiling.timed.
"""
import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
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

    hw = tuple(int(x) for x in os.environ.get("FR_HW", "376,1408").split(","))
    base = flagship_cfg()
    base = dataclasses.replace(base, data=dataclasses.replace(
        base.data, synthetic_image_hw=hw, synthetic_num_frames=2))
    ds = build_synthetic_dataset(base, seed=0)
    o, d = view_rays(ds, 0)
    iv = intersect_rays(o, d, view_primitives(ds, 0), base.render.near,
                        base.render.far, base.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)
    print(f"image {hw[0]}x{hw[1]} = {o.shape[0]} rays", flush=True)

    # (name, eval_ns, eval_ni, coarse_dw, keep)
    variants = [("64+64", 0, -1, 0, 0),
                ("32+32", 32, 32, 0, 0),
                ("32+32+prop", 32, 32, 128, 0)]
    if os.environ.get("FR_KEEP", "0") == "1":
        # round-4 forward-only optimization sweep: top-M truncation
        # (render.eval_keep_samples) alone and stacked with proposal coarse
        variants += [("64+64+keep96", 0, -1, 0, 96),
                     ("64+64+keep80", 0, -1, 0, 80),
                     ("prop", 0, -1, 128, 0),
                     ("prop+keep96", 0, -1, 128, 96),
                     ("prop+keep80", 0, -1, 128, 80),
                     ("prop+keep64", 0, -1, 128, 64)]
    fns = {}
    for name, ens, eni, cw, keep in variants:
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, coarse_trunk_depth=4 if cw else 0,
                                      coarse_trunk_width=cw),
            render=dataclasses.replace(base.render, eval_n_samples=ens,
                                       eval_n_importance=eni,
                                       eval_keep_samples=keep),
        )
        flax_model = make_network(cfg)
        params = init_params(flax_model, jax.random.key(0))
        model = resolve_train_model(cfg, flax_model)
        fn = jax.jit(lambda p, c=cfg, m=model: render_image_rays(
            m, p, o, d, bounds, c, iv=iv).rgb)
        timed(fn, params, iters=2, warmup=1)
        fns[name] = (fn, params)
        print(f"{name}: warmed", flush=True)

    rounds = int(os.environ.get("FR_ROUNDS", "3"))
    res = {k: [] for k in fns}
    for _ in range(rounds):
        for k, (fn, params) in fns.items():
            res[k].append(timed(fn, params, iters=3, warmup=0) * 1e3)
    for k, v in res.items():
        ms = float(np.median(v))
        print(f"{k:12s} median {ms:9.2f} ms/frame  {1e3 / ms:6.3f} FPS  "
              f"runs={[round(x, 1) for x in v]}", flush=True)


if __name__ == "__main__":
    main()
