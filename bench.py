#!/usr/bin/env python
"""Benchmark: fused TPU train step vs reference-equivalent eager pipeline.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, ...}

The baseline denominator (SURVEY.md §6 action item: the reference cannot run
here, so it must be *measured* as a faithful equivalent on the same
hardware) reproduces the reference's execution shape:
  - per-step ray sampling + ray/primitive intersection + interval-guided
    sampling in host numpy (the reference's DataLoader-worker work,
    [pn] lib/datasets/kitti360/panopticnerf.py)
  - a host->device copy of the prepared batch every step
  - Python-driven chunked render loop on device (cfg.chunk equivalent),
    per-chunk forward+backward with gradient accumulation
  - a separate optimizer-update dispatch
The fused path is this repo's single-jit train step (on-device sampling,
intersection, render, loss, backward, update).
Workload for both: the SHIPPED flagship (configs/kitti360_panoptic.yaml):
8x256 fine field + 4x128 proposal coarse (round-4 default — save_best
quality parity with the full coarse at 376x1408, BASELINE.md round-4 A/B),
2048 rays x (64 coarse + 64 importance) samples, 32 primitives, guided
sampling, full PanopticNeRF loss stack. The eager baseline keeps the
REFERENCE model shape (full 8x256 coarse — the reference has no proposal
field to shrink). The full-coarse fused step and a coarse-only
(n_importance=0) step are reported as secondary metrics for continuity
with round 1-3 records.
The eager baseline is the MEDIAN of several repeats (the denominator was
observed to swing ~1.8x between single runs); the spread is reported.

Denominator stability: the eager baseline is DISPATCH-BOUND (dozens of H2D
transfers + device dispatches per step through the axon relay), so its
rays/s tracks relay RTT, which drifts between invocations (observed medians
5.9k-18.5k across one session; within-run spread is tight). The headline
`vs_baseline` therefore divides by max(measured median, floor), where the
floor is the best (fastest, least RTT-inflated) eager baseline yet measured
on THIS setup — self-calibrating via out/bench_floor.json (gitignored;
ratchets up only), i.e. always the reading most favorable to the reference.
The raw measured ratio is still reported as `vs_measured_baseline`.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

FAST = os.environ.get("BENCH_FAST", "0") == "1"
# Logic smoke for CPU runs only — the flagship shape is TPU-sized.
TINY = os.environ.get("BENCH_TINY", "0") == "1"

# The vs_baseline floor is SELF-CALIBRATING per setup: the best (fastest)
# eager-baseline median ever measured on this machine is persisted under
# out/ (gitignored — a fresh clone starts from pure measurement) and only
# ever ratchets up. No magic constants: the first invocation on any setup
# has floor == measured median, i.e. vs_baseline == vs_measured_baseline —
# except that when out/ was wiped (container reset) the floor re-seeds from
# the committed BENCH_r*.json driver records, so the ratchet survives
# resets (see _committed_floor).
FLOOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "out", "bench_floor.json")


def read_floor() -> float:
    try:
        with open(FLOOR_FILE) as f:
            return float(json.load(f)["floor_rays_per_sec"])
    except Exception:
        return _committed_floor()


def _committed_floor(repo: str | None = None) -> float:
    """Ratchet continuity across container resets: out/ is wiped with the
    machine image, but the driver's BENCH_r*.json records (committed) embed
    the floor each round ran against. Seed from the best committed reading
    so a reset cannot quietly lower the bar (same TPU generation either
    way; a genuinely new setup just measures past it)."""
    import glob
    import re

    best = 0.0
    repo = repo or os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        try:
            tail = json.load(open(path)).get("tail", "")
        except Exception:
            continue
        for m in re.finditer(r'"baseline_floor_rays_per_sec":\s*([0-9.]+)', tail):
            best = max(best, float(m.group(1)))
    return best


def update_floor(median_rps: float) -> None:
    os.makedirs(os.path.dirname(FLOOR_FILE), exist_ok=True)
    with open(FLOOR_FILE, "w") as f:
        json.dump({"floor_rays_per_sec": round(median_rps, 1),
                   "note": "best eager-baseline median observed on this "
                           "setup; vs_baseline denominator floor"}, f)


def flagship_cfg():
    from panopticnerf_tpu.config import Config

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_image_hw = (94, 352)   # quarter-res KITTI-360 shape
    cfg.data.synthetic_num_frames = 8
    cfg.data.synthetic_num_boxes = 24
    cfg.data.n_rays = 2048
    cfg.data.max_primitives = 32
    cfg.data.max_intervals = 16
    cfg.model.num_classes = 19
    cfg.render.n_samples = 64
    cfg.render.n_importance = 64  # configs/kitti360_panoptic.yaml trains 64+64
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    # Both fused kernels win at the flagship shape on v5e (tools/ab_kernels:
    # XLA-only 24.5 ms -> both-Pallas 21.2 ms) and are on in the flagship
    # YAML config; bench measures the shipped configuration.
    cfg.model.use_pallas = True
    cfg.render.use_pallas_intersect = True
    # Round-5 shipped default: proposal-sized 4x64 coarse — two independent
    # full-res 10k save_best defenses (BASELINE.md round-5 "4x64 promoted";
    # the round-4 4x128 defense stands as the fallback shape).
    cfg.model.coarse_trunk_depth = 4
    cfg.model.coarse_trunk_width = 64
    # Round-5: eval-only keep-M truncation ships DEFAULT OFF — the round-4
    # quarter-res parity reading did not transfer to the full-res tree
    # (~4.3 dB PSNR cost at keep 96; BASELINE.md round-5 keep-M
    # correction). The shipped render_fps measures keep 0; the knob's
    # throughput is still tracked as render_fps_keep96.
    cfg.render.eval_keep_samples = 0
    cfg.train.lr = 5e-4
    if TINY:
        cfg.data.synthetic_image_hw = (24, 32)
        cfg.data.n_rays = 128
        cfg.model.trunk_depth = 2
        cfg.model.trunk_width = 32
        cfg.model.color_width = 16
        cfg.model.coarse_trunk_depth = 1
        cfg.model.coarse_trunk_width = 16
        cfg.render.n_samples = 8
        cfg.render.n_importance = 8
    return cfg


# ------------------------------------------------------------ eager baseline
def host_intersect(o, d, w2p, sem_ids, valid, near, far, k):
    """Reference-style CPU numpy ray/primitive intersection + top-k."""
    R = w2p[:, :, :3]
    t = w2p[:, :, 3]
    o_l = np.einsum("pij,nj->npi", R, o) + t[None]
    d_l = np.einsum("pij,nj->npi", R, d)
    safe = np.where(np.abs(d_l) < 1e-9, 1e-9, d_l)
    t1 = (-1.0 - o_l) / safe
    t2 = (1.0 - o_l) / safe
    t_in = np.maximum(np.minimum(t1, t2).max(-1), near)
    t_out = np.minimum(np.maximum(t1, t2).min(-1), far)
    hit = (t_out > t_in) & valid[None]
    t_in = np.where(hit, t_in, 1e9)
    t_out = np.where(hit, t_out, 1e9)
    idx = np.argsort(t_in, axis=1)[:, :k]
    take = lambda a: np.take_along_axis(a, idx, axis=1)
    return take(t_in), take(t_out), sem_ids[idx], take(hit)


def host_guided_z(rng, t_in, t_out, mask, n_samples, near, far):
    """Reference-style CPU stratified sampling inside intervals."""
    n, k = t_in.shape
    lengths = np.where(mask, t_out - t_in, 0.0)
    cdf = np.cumsum(lengths, axis=1)
    total = cdf[:, -1:]
    u = (np.arange(n_samples)[None] + rng.uniform(size=(n, n_samples))) / n_samples * total
    idx = (u[:, :, None] >= cdf[:, None, :]).sum(-1).clip(0, k - 1)
    cdf_prev = np.concatenate([np.zeros((n, 1)), cdf[:, :-1]], axis=1)
    z = np.take_along_axis(t_in, idx, 1) + (u - np.take_along_axis(cdf_prev, idx, 1))
    fallback = near + (far - near) * (np.arange(n_samples)[None] + 0.5) / n_samples
    z = np.where(total > 1e-8, z, fallback)
    return np.sort(z, axis=1).astype(np.float32)


def run_baseline(cfg, ds_host, model, state, iters, chunk=512):
    import jax
    import jax.numpy as jnp
    import optax

    from panopticnerf_tpu.render.renderer import SceneBounds, render_rays
    from panopticnerf_tpu.train.loss import compute_losses
    from panopticnerf_tpu.data.dataset import RayBatch
    from panopticnerf_tpu.ops.intersect import RayIntervals

    images, K, c2w, pseudo, depth, w2p, sem_ids, valid = ds_host
    h, w = images.shape[1:3]
    bounds = SceneBounds(jnp.zeros(3), jnp.asarray(0.05))
    rng = np.random.default_rng(0)
    tx = state.tx

    @jax.jit
    def chunk_grad(params, ro, rd, rgb, pse, dep, t_in, t_out, sem, inst, mask, z):
        iv = RayIntervals(t_in, t_out, sem, inst, mask)
        batch = RayBatch(ro, rd, rgb, pse, dep, jnp.zeros(ro.shape[0], jnp.int32),
                         jnp.ones(ro.shape[0], bool))

        def loss_fn(p):
            out = render_rays(model, p, ro, rd, bounds, jax.random.key(0), cfg,
                              iv=iv, train=True)
            return compute_losses(out, batch, cfg, 1.0)

        (l, st), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return l, g

    @jax.jit
    def apply_update(state, grads):
        return state.apply_gradients(grads=grads)

    def one_step(state):
        # ---- host-side "dataloader" work (the reference's CPU path) ----
        n = cfg.data.n_rays
        vi = rng.integers(0, images.shape[0], n)
        uu = rng.integers(0, w, n)
        vv = rng.integers(0, h, n)
        rgb = images[vi, vv, uu].astype(np.float32) / 255.0
        pse = pseudo[vi, vv, uu]
        dep = depth[vi, vv, uu]
        x = (uu + 0.5 - K[0, 2]) / K[0, 0]
        y = (vv + 0.5 - K[1, 2]) / K[1, 1]
        dirs = np.stack([x, y, np.ones_like(x)], 1)
        Rm = c2w[vi, :, :3]
        d = np.einsum("nij,nj->ni", Rm, dirs)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = c2w[vi, :, 3]
        t_in, t_out, sem, mask = host_intersect(
            o, d, w2p, sem_ids, valid, cfg.render.near, cfg.render.far,
            cfg.data.max_intervals)
        z = host_guided_z(rng, t_in, t_out, mask, cfg.render.n_samples,
                          cfg.render.near, cfg.render.far)
        # ---- H2D + chunked device loop (the reference's render chunks) ----
        grads = None
        loss = 0.0
        for c0 in range(0, n, chunk):
            sl = slice(c0, c0 + chunk)
            l, g = chunk_grad(
                state.params,
                jnp.asarray(o[sl], jnp.float32), jnp.asarray(d[sl], jnp.float32),
                jnp.asarray(rgb[sl]), jnp.asarray(pse[sl]), jnp.asarray(dep[sl]),
                jnp.asarray(t_in[sl], jnp.float32), jnp.asarray(t_out[sl], jnp.float32),
                jnp.asarray(sem[sl], jnp.int32), jnp.asarray(sem[sl], jnp.int32),
                jnp.asarray(mask[sl]), jnp.asarray(z[sl]),
            )
            grads = g if grads is None else jax.tree.map(lambda a, b: a + b, grads, g)
            loss = loss + l
        state = apply_update(state, jax.tree.map(lambda a: a / (n // chunk), grads))
        return state, loss

    # warmup/compile; float() readback is the only true sync through the
    # axon relay (block_until_ready returns before remote execution ends).
    state, loss = one_step(state)
    float(loss)
    t0 = time.time()
    for _ in range(iters):
        state, loss = one_step(state)
    float(loss)  # drain the device queue
    dt = time.time() - t0
    return cfg.data.n_rays * iters / dt


def main():
    import jax
    import jax.numpy as jnp

    # sitecustomize imports jax before this file runs, so the env var alone
    # doesn't latch — set the cache dir on the live config.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    cfg = flagship_cfg()
    platform = jax.devices()[0].platform
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))

    def time_fused(cfg, state, iters, model=model):
        step = make_train_step(cfg, model, donate=False)
        view_ids = jnp.arange(int(ds.images.shape[0]))
        key = jax.random.key(0)
        s, stats = step(state, ds, view_ids, key)  # compile
        float(stats["loss_total"])  # true sync (see note in run_baseline)
        t0 = time.time()
        for _ in range(iters):
            s, stats = step(s, ds, view_ids, key)  # per-step RNG folds on device
        float(stats["loss_total"])  # drain queue
        return cfg.data.n_rays * iters / (time.time() - t0), s

    # ---------- fused paths ----------
    # Headline: the SHIPPED flagship (proposal 4x128 coarse + 8x256 fine —
    # round-4 default, quality-defended at full res in BASELINE.md round-4).
    # Secondary: the reference-shape full 8x256 coarse (round 1-3 headline)
    # and a coarse-only step, both for record continuity.
    iters = 20 if FAST else 200
    fused_rps, s = time_fused(cfg, state, iters)
    import dataclasses

    cfg_ref = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, coarse_trunk_depth=0, coarse_trunk_width=0))
    model_ref = make_network(cfg_ref)
    state_ref = make_train_state(
        cfg_ref, model_ref, init_params(model_ref, jax.random.key(0)))
    fused_full_rps, _ = time_fused(cfg_ref, state_ref, iters, model=model_ref)

    cfg_coarse = dataclasses.replace(
        cfg_ref, render=dataclasses.replace(cfg_ref.render, n_importance=0)
    )
    fused_coarse_rps, _ = time_fused(cfg_coarse, state_ref, iters,
                                     model=model_ref)

    # ---------- full-image render FPS (the second headline metric) ----------
    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.ops import intersect_rays
    from panopticnerf_tpu.render import SceneBounds, render_image_rays

    o, d = view_rays(ds, 0)
    iv = intersect_rays(o, d, view_primitives(ds, 0), cfg.render.near,
                        cfg.render.far, cfg.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)

    def fps_of(render_fn):
        # Median of 3 timed blocks: a single multi-second relay stall once
        # deflated a one-block reading 5x (10.3 -> 1.8 FPS) while every
        # other metric in the invocation was normal. Per-block sync via
        # value readback, as everywhere.
        out = render_fn(s.params)
        float(out.rgb[0, 0])
        r_iters = 2 if FAST else 10
        rates = []
        for _ in range(1 if FAST else 3):
            t0 = time.time()
            for _ in range(r_iters):
                out = render_fn(s.params)
            float(out.rgb[0, 0])
            rates.append(r_iters / (time.time() - t0))
        return sorted(rates)[len(rates) // 2]

    render_fps = fps_of(jax.jit(
        lambda p: render_image_rays(model, p, o, d, bounds, cfg, iv=iv)))
    h, w = cfg.data.synthetic_image_hw

    # Same frame with the eval-sample knob at 32+32 (render.eval_n_samples):
    # 2.0x the frame rate at -0.018 mIoU on the shipped checkpoint
    # (BASELINE.md round-3 eval-sample study).
    cfg_e32 = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, eval_n_samples=32, eval_n_importance=32))
    render_fps_e32 = fps_of(jax.jit(
        lambda p: render_image_rays(model, p, o, d, bounds, cfg_e32, iv=iv)))

    # keep-M truncation as the opt-in knob (default off since round 5 —
    # scene-dependent PSNR cost; BASELINE.md round-5 keep-M correction).
    cfg_k96 = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, eval_keep_samples=96))
    render_fps_k96 = fps_of(jax.jit(
        lambda p: render_image_rays(model, p, o, d, bounds, cfg_k96, iv=iv)))

    # ---------- eager-equivalent baseline: median of repeats ----------
    ds_host = (
        np.asarray(ds.images), np.asarray(ds.K[0]), np.asarray(ds.c2w),
        np.asarray(ds.pseudo), np.asarray(ds.depth),
        np.asarray(ds.prim_w2p[0]), np.asarray(ds.prim_sem[0]),
        np.asarray(ds.prim_valid[0]),
    )
    base_iters = 3 if FAST else 15
    base_repeats = 1 if FAST else 3
    # The eager baseline keeps the REFERENCE model shape (full 8x256
    # coarse): the reference has no proposal field, so shrinking its coarse
    # would understate it.
    base_runs = [
        run_baseline(cfg_ref, ds_host, model_ref,
                     make_train_state(cfg_ref, model_ref, state_ref.params),
                     base_iters)
        for _ in range(base_repeats)
    ]
    base_rps = float(np.median(base_runs))
    # Conservative denominator: never claim more speedup than the
    # best-ever-observed baseline on THIS setup supports. TINY/FAST runs
    # neither use nor update the floor (different shape / too few iters).
    floor = 0.0
    if not TINY:
        floor = read_floor()
        # Only full-length runs may RAISE the floor (FAST medians are too
        # few iters to trust), but every non-TINY run APPLIES it — without
        # it a slow-relay FAST invocation would print an RTT-inflated
        # headline far outside the honest band.
        if not FAST and base_rps > floor:
            floor = base_rps
            update_floor(base_rps)
    denom = max(base_rps, floor)

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(fused_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(fused_rps / denom, 2),
        "vs_measured_baseline": round(fused_rps / base_rps, 2),
        "baseline_rays_per_sec": round(base_rps, 1),
        "baseline_floor_rays_per_sec": floor or None,
        "baseline_spread": [round(min(base_runs), 1), round(max(base_runs), 1)],
        "platform": platform,
        "rays_per_batch": cfg.data.n_rays,
        "samples_per_ray": [cfg.render.n_samples, cfg.render.n_importance],
        "flagship_coarse_trunk": [cfg.model.coarse_trunk_depth,
                                  cfg.model.coarse_trunk_width],
        "fused_full_coarse_rays_per_sec": round(fused_full_rps, 1),
        "fused_coarse_only_rays_per_sec": round(fused_coarse_rps, 1),
        "render_fps": round(render_fps, 2),
        "render_fps_eval32": round(render_fps_e32, 2),
        "render_fps_keep96": round(render_fps_k96, 2),
        "render_image_hw": [h, w],
    }))


if __name__ == "__main__":
    main()
