#!/usr/bin/env python
"""Standalone repro/bisect harness for the 8192-ray Pallas regalloc bug.

Symptom (round 1, v5e via axon): compiling the fused train step with the
Pallas trunk (`model.use_pallas: true`) at data.n_rays=8192 dies inside the
platform compiler with a RET_CHECK in the jellyfish lsrav2 register
allocator (live_range_finder), while 2048 and 16384 rays compile fine.
The kernel in isolation (same point count) also compiles fine, so the
trigger is the *surrounding program shape* — this harness bisects which
surrounding structure it is.

Usage (on the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/repro_regalloc.py
runs every case in its own subprocess and prints a PASS/FAIL table;
`python tools/repro_regalloc.py CASE` runs one case inline.

Findings are recorded in docs/REGALLOC_RETCHECK.md.
"""

from __future__ import annotations

import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# case -> (n_rays, n_importance, use_pallas, trunk_chunk_pts or None=default)
STEP_CASES = {
    # the original failure triangle
    "step_2048": (2048, 0, True, None),
    "step_8192": (8192, 0, True, None),
    "step_16384": (16384, 0, True, None),
    "step_8192_xla": (8192, 0, False, None),
    # chunking bisect: one huge kernel call vs different lax.map trip counts
    "step_8192_nochunk": (8192, 0, True, 1 << 30),
    "step_8192_chunk64k": (8192, 0, True, 65536),
    "step_8192_chunk256k": (8192, 0, True, 262144),
    # the flagship coarse+fine shape at 8192 rays
    "step_8192_fine": (8192, 64, True, None),
}
ISO_CASES = {
    # kernel in isolation at the failing step's point count (8192*64)
    "iso_524288": (524288, None),
    "iso_524288_nochunk": (524288, 1 << 30),
}


def _build_cfg(n_rays, n_importance, use_pallas):
    sys.path.insert(0, REPO)
    import bench

    cfg = bench.flagship_cfg()
    cfg.data.n_rays = n_rays
    cfg.render.n_importance = n_importance
    cfg.model.use_pallas = use_pallas
    return cfg


def run_step_case(name):
    import jax

    n_rays, n_imp, use_pallas, chunk = STEP_CASES[name]
    if chunk is not None:
        import panopticnerf_tpu.ops.pallas_mlp_train as pmt

        orig = pmt.fused_trunk_train

        def patched(x, w, b, s, tile=512, interpret=False, chunk_pts=chunk):
            return orig(x, w, b, s, tile=tile, interpret=interpret,
                        chunk=chunk_pts)

        pmt.fused_trunk_train = patched
        # pallas_apply imported it by name; repatch there too
        import panopticnerf_tpu.models.pallas_apply  # noqa: F401

    cfg = _build_cfg(n_rays, n_imp, use_pallas)
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step
    import jax.numpy as jnp

    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    view_ids = jnp.arange(int(ds.images.shape[0]))
    _, stats = step(state, ds, view_ids, jax.random.key(0))
    print(f"{name}: OK loss={float(stats['loss_total']):.4f}")


def run_iso_case(name):
    import jax
    import jax.numpy as jnp

    n_pts, chunk = ISO_CASES[name]
    from panopticnerf_tpu.ops.pallas_mlp_train import fused_trunk_train

    key = jax.random.key(0)
    f, width, depth = 63, 256, 8
    dims = [f] + [width] * depth
    ws, bs = [], []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        a = a + f if i == 4 else a  # skip layer consumes [h, x]
        key, sub = jax.random.split(key)
        ws.append(jax.random.normal(sub, (a, b), jnp.float32) * 0.05)
        bs.append(jnp.zeros((b,), jnp.float32))
    x = jax.random.normal(key, (n_pts, f), jnp.bfloat16)
    kw = {} if chunk is None else {"chunk": chunk}

    def loss(ws):
        return jnp.sum(fused_trunk_train(x, ws, bs, (4,), **kw))

    g = jax.jit(jax.grad(loss))(ws)
    print(f"{name}: OK g0={float(jnp.sum(g[0])):.4f}")


def main():
    if len(sys.argv) > 1:
        name = sys.argv[1]
        if name in STEP_CASES:
            run_step_case(name)
        else:
            run_iso_case(name)
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    results = {}
    for name in list(STEP_CASES) + list(ISO_CASES):
        # Each case in a fresh process: a failed platform compile can poison
        # the backend, and the TPU claim serializes anyway.
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=1200, env=env,
        )
        ok = r.returncode == 0
        tail = (r.stdout + r.stderr).strip().splitlines()
        tail = tail[-1][:160] if tail else ""
        results[name] = (ok, tail)
        print(f"{'PASS' if ok else 'FAIL':4s}  {name:24s} {tail}", flush=True)
    n_fail = sum(1 for ok, _ in results.values() if not ok)
    print(f"\n{len(results) - n_fail}/{len(results)} cases pass")


if __name__ == "__main__":
    main()
