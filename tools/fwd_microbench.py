#!/usr/bin/env python
"""Forward-only trunk microbench: XLA chain vs Pallas kernel, by chunk/tile.

Answers why the fused trunk kernel LOSES on the eval render (ab_render.py:
108.9 vs 96.3 ms/frame) despite eliminating per-layer activation HBM
round-trips: is the kernel's pure forward slower than XLA's (Mosaic
scheduling), or is the forward fine and the loss all custom-call boundary
(PE/heads can't fuse across it)? Times the bare trunk at the eval fine-pass
point count, no autodiff.
"""
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
    from panopticnerf_tpu.ops.pallas_mlp_train import fused_trunk_train
    from panopticnerf_tpu.utils.profiling import timed

    n = int(os.environ.get("FWD_N", str(33088 * 128)))  # eval fine-pass pts
    f, width, layers, skip = 63, 256, 8, (5,)
    key = jax.random.key(0)
    ks = jax.random.split(key, layers + 1)
    dims_in = [f] + [width] * (layers - 1)
    dims_in[5] = width + f
    ws = [jax.random.normal(ks[i], (dims_in[i], width), jnp.float32) * 0.05
          for i in range(layers)]
    bs = [jnp.zeros((width,), jnp.float32) for _ in range(layers)]
    x = jax.random.normal(ks[-1], (n, f), jnp.bfloat16)

    fwd_flops = 2 * n * sum(a * 256 for a in dims_in)

    def bench(label, fn):
        f_jit = jax.jit(lambda v: jnp.sum(fn(v).astype(jnp.float32)))
        ms = timed(f_jit, x, iters=int(os.environ.get("FWD_ITERS", "20")),
                   warmup=2) * 1e3
        eff = fwd_flops / (ms * 1e-3) / 197e12 * 100
        print(f"{label:40s} {ms:8.3f} ms   {eff:5.1f}% MXU", flush=True)

    def xla_trunk(v):
        h = v
        for i in range(layers):
            if i in skip:
                h = jnp.concatenate([h, v], -1)
            h = jnp.maximum(h @ ws[i].astype(h.dtype) + bs[i].astype(h.dtype), 0)
        return h

    bench("xla chain bf16", xla_trunk)
    for chunk in (32_768, 131_072, 524_288, n):
        for tile in (1024,):
            bench(f"pallas chunk={chunk} tile={tile}",
                  functools.partial(fused_trunk_train, weights=ws, biases=bs,
                                    skips=skip, tile=tile, chunk=chunk))


if __name__ == "__main__":
    main()
