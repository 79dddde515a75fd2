#!/usr/bin/env python
"""MLP backward-efficiency hunt (ROADMAP round-2 item 2).

The flagship step is ~90% MLP fwd+bwd; fwd runs ~40% MXU but fwd+bwd only
~30%. This times jax.grad on a ladder of model variants at the flagship
point count to isolate which piece (PE, skip concat, heads, bf16 casts)
drags the backward. Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/mlp_microbench.py
"""

from __future__ import annotations

import functools
import os
import sys

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

    from panopticnerf_tpu.utils.profiling import timed

    n = 2048 * 128            # flagship fine-pass point count
    width = 256
    iters = int(os.environ.get("MB_ITERS", "30"))
    key = jax.random.key(0)

    def bench(label, fn, params, x, flops):
        g = jax.jit(lambda p, v: sum(
            jnp.sum(t) for t in jax.tree.leaves(jax.grad(fn)(p, v))))
        ms = timed(g, params, x, iters=iters, warmup=2) * 1e3
        eff = flops / (ms * 1e-3) / 197e12 * 100  # v5e bf16 peak ~197 TFLOPs
        print(f"{label:46s} {ms:8.3f} ms   {eff:5.1f}% MXU", flush=True)
        return ms

    def dense_params(k, dims, dtype=jnp.float32):
        ws = []
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            k, sub = jax.random.split(k)
            ws.append(jax.random.normal(sub, (a, b), dtype) * 0.05)
        return ws

    def mlp(ws, x, dtype=jnp.bfloat16):
        h = x.astype(dtype)
        for w in ws:
            h = jnp.maximum(h @ w.astype(dtype), 0)
        return jnp.sum(h.astype(jnp.float32))

    # fwd+bwd FLOPs = 3x fwd (dW + dx matmuls)
    mm = lambda dims: sum(a * b for a, b in zip(dims[:-1], dims[1:]))

    # 1. pure 8-layer 256-wide relu chain, bf16
    dims = [256] * 9
    x = jax.random.normal(key, (n, 256), jnp.float32)
    bench("pure 8x256 relu chain bf16", mlp, dense_params(key, dims), x,
          3 * 2 * n * mm(dims))

    # 2. same, f32 compute
    bench("pure 8x256 relu chain f32",
          functools.partial(mlp, dtype=jnp.float32),
          dense_params(key, dims), x, 3 * 2 * n * mm(dims))

    # 3. 63-wide PE input layer (the real first-layer shape)
    dims63 = [63] + [256] * 8
    x63 = jax.random.normal(key, (n, 63), jnp.float32)
    bench("63-dim input layer + 7x256 bf16", mlp, dense_params(key, dims63),
          x63, 3 * 2 * n * mm(dims63))

    # 4. with the skip concat at layer 4 (319-wide matmul)
    def mlp_skip(ws, x, dtype=jnp.bfloat16):
        xc = x.astype(dtype)
        h = xc
        for i, w in enumerate(ws):
            if i == 5:
                h = jnp.concatenate([h, xc], -1)
            h = jnp.maximum(h @ w.astype(dtype), 0)
        return jnp.sum(h.astype(jnp.float32))

    dims_skip = [63, 256, 256, 256, 256, 256 + 63, 256, 256, 256]
    ws_skip = dense_params(key, [63] + [256] * 8)
    ws_skip[5] = jax.random.normal(key, (319, 256), jnp.float32) * 0.05
    bench("+ skip concat (319-wide layer 5) bf16", mlp_skip, ws_skip, x63,
          3 * 2 * n * mm(dims_skip))

    # 5. the real flax model apply (trunk + all heads, PE inside)
    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.models import init_params, make_network

    cfg = Config()
    cfg.model.num_classes = 19
    cfg.render.n_importance = 64
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    pts = jax.random.normal(key, (2048, 128, 3), jnp.float32) * 0.01
    dirs = jax.random.normal(key, (2048, 1, 3), jnp.float32)

    def full(p, pts):
        sigma, rgb, sem = model.apply(p, pts, dirs, level=1)
        return jnp.sum(sigma) + jnp.sum(rgb) + jnp.sum(sem)

    # rough flop count: trunk (63->256, 6x256, 319->256) + heads
    per_pt = 2 * (63 * 256 + 6 * 256 * 256 + 319 * 256
                  + 256 + 256 * 128 + 128 * 19 + 256 * 256
                  + 283 * 128 + 128 * 3)
    bench("real flax field (trunk+heads, PE, bf16)", full, params, pts,
          3 * n * per_pt)

    # 6. real model with f32 compute
    cfg32 = Config()
    cfg32.model.num_classes = 19
    cfg32.model.compute_dtype = "float32"
    cfg32.render.n_importance = 64
    model32 = make_network(cfg32)
    params32 = init_params(model32, jax.random.key(0))

    def full32(p, pts):
        sigma, rgb, sem = model32.apply(p, pts, dirs, level=1)
        return jnp.sum(sigma) + jnp.sum(rgb) + jnp.sum(sem)

    bench("real flax field f32 compute", full32, params32, pts, 3 * n * per_pt)


if __name__ == "__main__":
    main()
