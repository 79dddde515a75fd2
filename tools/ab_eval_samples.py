#!/usr/bin/env python
"""Eval-render sample-count sweep: FPS vs quality on the shipped weights.

The full-image render is MLP-bound (BASELINE.md), so ms/frame should scale
~linearly with points/ray; guided sampling concentrates samples inside
primitive intervals, so fewer eval samples may cost little quality. This
measures both sides on the flagship synthetic checkpoint (artifacts/):

  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_eval_samples.py
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
    from panopticnerf_tpu.config import load_config
    from panopticnerf_tpu.data import make_dataset
    from panopticnerf_tpu.engine import _render_view
    from panopticnerf_tpu.eval import make_evaluator
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train.checkpoint import load_network
    from panopticnerf_tpu.utils.profiling import timed

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs", "synthetic_flagship.yaml"),
                      ["model_dir", os.path.join(repo, "artifacts")])
    ds, train_ids, test_ids = make_dataset(cfg)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    params, step = load_network(params, cfg.trained_model_dir)
    print(f"restored step {step}; eval view {int(test_ids[0])}")
    view = int(test_ids[0])
    gt_rgb = np.asarray(ds.images[view], np.float32).reshape(-1, 3) / 255.0
    gt_sem = np.asarray(ds.gt_sem[view]).reshape(-1)
    gt_inst = np.asarray(ds.gt_inst[view]).reshape(-1)

    sweeps = [(0, -1, 0), (48, 48, 0), (32, 32, 0), (32, 16, 0), (64, 0, 0),
              (24, 24, 0)]
    if os.environ.get("ABS_KEEP", "0") == "1":
        # round-4 top-M truncation (render.eval_keep_samples) quality arm
        sweeps = [(0, -1, 0), (0, -1, 96), (0, -1, 80), (0, -1, 64),
                  (0, -1, 48), (32, 32, 0)]
    for ns, ni, keep in sweeps:
        c = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, eval_n_samples=ns, eval_n_importance=ni,
            eval_keep_samples=keep))
        render = jax.jit(lambda p: _render_view(c, model, p, ds, view))
        out = render(params)  # compile
        ms = timed(lambda p: render(p).rgb.sum(), params, iters=10, warmup=2) * 1e3
        ev = make_evaluator(c)
        ev.evaluate(out, gt_rgb, gt_sem, gt_inst)
        r = ev.summarize()
        eff = (ns or c.render.n_samples, ni if ni >= 0 else c.render.n_importance)
        eff = (eff[0], eff[1] if not keep else f"{eff[1]}k{keep}")
        print(f"eval {eff[0]:3}+{eff[1]:>3}: {ms:7.2f} ms/frame "
              f"({1e3 / ms:5.2f} FPS)  psnr {r['psnr']:.2f}  "
              f"miou {r.get('miou', float('nan')):.4f}  "
              f"pq {r.get('pq', float('nan')):.4f}", flush=True)


if __name__ == "__main__":
    main()
