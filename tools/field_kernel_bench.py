#!/usr/bin/env python
"""Direct fwd+bwd timing of the fused field kernel vs XLA at the flagship
point count, sweeping kernel tile sizes."""
import os, sys
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
    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.models.pallas_apply import PallasApplyAdapter
    from panopticnerf_tpu.utils.profiling import timed

    cfg = Config()
    cfg.model.num_classes = 19
    cfg.render.n_importance = 64
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    key = jax.random.key(1)
    n = 2048
    pts = jax.random.normal(key, (n, 128, 3), jnp.float32) * 0.01
    dirs = jax.random.normal(key, (n, 1, 3), jnp.float32)
    leafsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t))
    iters = int(os.environ.get("FB_ITERS", "30"))

    def loss(apply_fn, p):
        sigma, rgb, sem = apply_fn(p, pts, dirs, level=1)
        return jnp.sum(sigma) + jnp.sum(rgb) + jnp.sum(sem)

    for label, fn in [
        ("xla fwd", jax.jit(lambda p: loss(model.apply, p))),
        ("xla fwd+bwd", jax.jit(lambda p: leafsum(jax.grad(
            lambda q: loss(model.apply, q))(p)))),
    ]:
        print(f"{label:28s} {timed(fn, params, iters=iters, warmup=2)*1e3:8.3f} ms", flush=True)

    for tile in (256, 512, 1024):
        ad = PallasApplyAdapter(cfg.model, has_fine=True, tile=tile)
        try:
            f = jax.jit(lambda p, a=ad: loss(a.apply, p))
            print(f"pallas fwd      tile={tile:4d} {timed(f, params, iters=iters, warmup=2)*1e3:8.3f} ms", flush=True)
            g = jax.jit(lambda p, a=ad: leafsum(jax.grad(lambda q: loss(a.apply, q))(p)))
            print(f"pallas fwd+bwd  tile={tile:4d} {timed(g, params, iters=iters, warmup=2)*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"pallas tile={tile}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

if __name__ == "__main__":
    main()
