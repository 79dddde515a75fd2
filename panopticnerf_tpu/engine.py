"""Top-level engine: train / evaluate / visualize / throughput entry points.

Reference: `train_net.py` + `run.py --type {evaluate,visualize,network}`
([pn], unverified — SURVEY.md §3). The CLI surface is preserved; internally
everything routes through the jitted step/renderer.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data import make_dataset, view_primitives, view_rays
from panopticnerf_tpu.eval import make_evaluator
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.ops import intersect_rays
from panopticnerf_tpu.render import SceneBounds, render_image_rays
from panopticnerf_tpu.train import make_train_state, make_train_step
from panopticnerf_tpu.train.step import eval_params
from panopticnerf_tpu.train.checkpoint import load_model, load_network, save_model
from panopticnerf_tpu.train.recorder import Recorder


def _lead_log(log):
    """(is_lead, log') — multi-host host-side policy in one place: every
    process runs the SPMD programs, process 0 owns console + files."""
    lead = jax.process_index() == 0
    return lead, (log if lead else lambda *a, **k: None)


def _build(cfg: Config):
    ds, train_ids, test_ids = make_dataset(cfg)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(cfg.train.seed))
    state = make_train_state(cfg, model, params)
    return ds, train_ids, test_ids, model, state


def _make_step(cfg: Config, model, log=print, donate: bool = True):
    """Single-device jit, or the mesh-parallel pjit step when more than one
    device is visible (cfg.parallel.data_parallel caps the mesh; reference
    parity: DDP-style ray-batch data parallelism, SURVEY.md §2.4)."""
    n_dev = cfg.parallel.data_parallel or jax.device_count()
    if n_dev > 1 and cfg.data.n_rays % n_dev == 0:
        from panopticnerf_tpu.parallel import make_mesh, make_parallel_train_step

        mesh = make_mesh(cfg)
        log(f"data-parallel over {mesh.devices.size} devices "
            f"(rays sharded, grads psum over '{cfg.parallel.mesh_axis_name}')")
        return make_parallel_train_step(cfg, model, mesh, donate=donate)
    if n_dev > 1:
        log(f"NOTE: {n_dev} devices visible but data.n_rays={cfg.data.n_rays} "
            f"does not divide evenly — training single-device")
    return make_train_step(cfg, model, donate=donate)


def _eval_model(cfg: Config, model):
    """Model used on the render/eval path: always the plain flax (XLA) field.

    The Pallas trunk kernel wins in the TRAIN step (its recompute backward
    removes per-layer HBM activation round-trips) but LOSES on the
    forward-only render: XLA 96.4 vs trunk-kernel 111.7 ms/frame at the
    flagship eval shape (tools/ab_render.py, interleaved medians on v5e) —
    with no backward to feed, the custom-call boundary and pack/unpack
    cost more than the fusion saves. `model.use_pallas` therefore only
    switches the train step; eval stays XLA.
    """
    return model


def _eval_mesh(cfg: Config):
    """Mesh for eval-time full-image rendering when >1 device is visible."""
    n_dev = cfg.parallel.data_parallel or jax.device_count()
    if n_dev <= 1:
        return None
    from panopticnerf_tpu.parallel import make_mesh

    return make_mesh(cfg)


def _intersect_and_render(cfg: Config, model, params, o, d, prims, bounds,
                          mesh=None):
    """Shared tail of every full-image render: interval intersection
    (Pallas kernel single-device only — its custom call cannot be
    partitioned by GSPMD) then the tiled render, mesh-sharded when given.
    Used by per-view eval/visualize renders AND trajectory frames so the
    render contract lives in one place."""
    model = _eval_model(cfg, model)
    iv = None
    if cfg.render.use_primitives:
        if cfg.render.use_pallas_intersect and mesh is None:
            from panopticnerf_tpu.ops.pallas_intersect import intersect_rays_pallas

            iv = intersect_rays_pallas(
                o, d, prims, cfg.render.near, cfg.render.far,
                cfg.data.max_intervals,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            iv = intersect_rays(o, d, prims, cfg.render.near, cfg.render.far,
                                cfg.data.max_intervals)
    if mesh is not None:
        from panopticnerf_tpu.parallel import render_image_rays_sharded

        return render_image_rays_sharded(model, params, o, d, bounds, cfg,
                                         mesh, iv=iv)
    return render_image_rays(model, params, o, d, bounds, cfg, iv=iv)


def _render_view(cfg: Config, model, params, ds, view: int, mesh=None):
    o, d = view_rays(ds, view)
    prims = view_primitives(ds, view) if cfg.render.use_primitives else None
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)
    return _intersect_and_render(cfg, model, params, o, d, prims, bounds,
                                 mesh=mesh)


def evaluate_views(cfg: Config, model, params, ds, view_ids, render=None) -> dict:
    ev = make_evaluator(cfg)
    if render is None:
        mesh = _eval_mesh(cfg)
        render = jax.jit(lambda p, v: _render_view(cfg, model, p, ds, v, mesh=mesh))
    for view in view_ids:
        out = render(params, int(view))
        gt_rgb = np.asarray(ds.images[view], np.float32).reshape(-1, 3) / 255.0
        gt_sem = np.asarray(ds.gt_sem[view]).reshape(-1) if ds.gt_sem is not None else None
        gt_inst = np.asarray(ds.gt_inst[view]).reshape(-1) if ds.gt_inst is not None else None
        valid = (np.asarray(ds.valid_mask[view]).reshape(-1)
                 if ds.valid_mask is not None else None)
        gt_depth = (np.asarray(ds.depth[view]).reshape(-1)
                    if ds.depth is not None else None)
        ev.evaluate(out, gt_rgb, gt_sem, gt_inst, valid=valid,
                    gt_depth=gt_depth, image_hw=ds.images.shape[1:3])
    return ev.summarize()


def run_train(cfg: Config, max_steps: int | None = None, log=print) -> dict:
    """Reference train_net.py equivalent: epoch loop with save/eval cadence.

    Multi-host (jax.process_count() > 1, e.g. a TPU slice joined via
    jax.distributed): every process executes the same SPMD program — train
    steps, eval renders, and orbax checkpoint saves (orbax coordinates the
    cross-host write itself, so save_model must run on ALL processes) —
    while host-side side effects (recorder streams, the best-metric
    sidecar, console lines) belong to process 0 only.
    """
    lead, log = _lead_log(log)
    ds, train_ids, test_ids, model, state = _build(cfg)
    step_fn = _make_step(cfg, model, log=log)

    # Optional streaming: keep a rotating window of views in HBM
    # (data.stream_window > 0) for sequences larger than device memory.
    # make_dataset built `ds` HOST-resident in this mode, so peak HBM is
    # the train window plus a small eval window of the test views.
    streamer = None
    eval_ds = ds
    if cfg.data.stream_window > 0:
        from panopticnerf_tpu.data.stream import HostViews, ViewWindowStreamer

        host = HostViews.from_device(ds)
        streamer = ViewWindowStreamer(
            host, cfg.data.stream_window, seed=cfg.train.seed, include=train_ids
        )
        ds, _ = streamer.current()
        train_ids = np.arange(cfg.data.stream_window)
        eval_ds = host.window(np.asarray(test_ids))
        test_ids = np.arange(len(test_ids))
    recorder = Recorder(cfg.record_path, write=lead)
    ckpt_dir = cfg.trained_model_dir

    start_step = 0
    if cfg.train.init_from:
        # Partial merge (strict=False): the reference's `pretrain nerf`
        # recipe warm-starts a wider model (fine field, new heads) from a
        # narrower pretrained one; unmatched subtrees keep fresh init.
        params, init_step = load_network(state.params, cfg.train.init_from,
                                         strict=False)
        # Re-seed the EMA at the warm-started weights (an average anchored
        # to the fresh init would drag evals toward random weights). Copy,
        # don't alias: the step donates the state (see make_train_state).
        state = state.replace(
            params=params,
            ema_params=(jax.tree.map(jnp.copy, params)
                        if state.ema_params is not None else None))
        log(f"warm-started params from {cfg.train.init_from} (step {init_step})")
    if cfg.train.resume:
        state, restored = load_model(state, ckpt_dir)
        if restored is not None:
            start_step = restored
            log(f"resumed from step {start_step}")

    tc = cfg.train
    total_steps = max_steps if max_steps is not None else tc.epochs * tc.ep_iter
    view_ids = jnp.asarray(train_ids)
    key = jax.random.key(tc.seed + 1)
    t0 = time.time()
    rays_done = 0
    last_metrics = {}
    # Best-metric state survives preemption/resume via a sidecar json —
    # otherwise the first post-resume eval (trivially > -inf) would
    # overwrite the true best checkpoint with a worse one. Both the best
    # checkpoint and its sidecar live as SIBLINGS of the orbax step root
    # (cfg.best_model_dir) — nesting them inside it relies on orbax
    # silently skipping non-step entries, a version-dependent behavior.
    best_meta_path = cfg.best_metric_path
    if not os.path.exists(best_meta_path):
        # runs recorded before the sidecar moved beside the step root
        legacy_meta = os.path.join(ckpt_dir, "best_metric.json")
        if os.path.exists(legacy_meta):
            best_meta_path = legacy_meta
    best_val = -np.inf
    best_kind = None  # which metric best_val was computed with (sidecar)
    if cfg.train.resume and os.path.exists(best_meta_path):
        import json

        with open(best_meta_path) as f:
            meta = json.load(f)
        best_val = float(meta["value"])
        # pre-round-3 sidecars recorded no metric name; they were written
        # by mIoU-only (or PSNR-only) selection, never the (mIoU+PQ)/2 mean
        best_kind = meta.get("metric", "legacy")
        log(f"best-metric state restored: {best_val:.4f}"
            + (f" ({best_kind})" if best_kind else ""))

    # Preemption-safe save (SURVEY.md §5.3): TPU preemptions deliver SIGTERM;
    # flag it and checkpoint at the next step boundary before exiting.
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True

    prev_handler = signal.signal(signal.SIGTERM, _on_term)
    # Build the in-train eval render ONCE (a fresh jit per eval cadence
    # would retrace the full-image renderer every eval_ep).
    eval_render = [None]

    # In-train eval view count (train.eval_views; 0 = all test views): the
    # save_best selection metric is only as good as the eval it's computed
    # on — a 2-view mIoU on noisy pseudo-labels picks lucky outliers.
    n_ev = cfg.train.eval_views
    eval_view_ids = test_ids if n_ev <= 0 else test_ids[:n_ev]

    def _eval_now(params_now):
        if eval_render[0] is None:
            m = _eval_mesh(cfg)
            eval_render[0] = jax.jit(
                lambda p, v: _render_view(cfg, model, p, eval_ds, v, mesh=m))
        return evaluate_views(cfg, model, params_now, eval_ds, eval_view_ids,
                              render=eval_render[0])

    lr_sched = make_lr(cfg)
    try:
        for step in range(start_step, total_steps):
            if preempted["flag"]:
                log(f"SIGTERM received: checkpointing at step {step} and exiting")
                save_model(state, ckpt_dir, step)
                return {"state": state, "model": model, "ds": ds,
                        "test_ids": test_ids, "metrics": last_metrics,
                        "preempted": True}
            if streamer is not None and step > 0 and step % cfg.data.stream_refresh_steps == 0:
                ds, win_ids = streamer.advance()
                log(f"stream window refresh #{streamer.refreshes} @step {step}: "
                    f"{len(win_ids)} views [{win_ids.min()}..{win_ids.max()}]")
            state, stats = step_fn(state, ds, view_ids, key)
            rays_done += cfg.data.n_rays
            if (step + 1) % tc.log_interval == 0:
                # ONE stacked readback: per-scalar float() costs a full relay
                # round-trip each (~35 ms x ~10 stats halved the observed
                # in-loop rays/s vs the benched step rate).
                names = sorted(stats)
                vals = np.asarray(jnp.stack([jnp.asarray(stats[k], jnp.float32)
                                             for k in names]))
                scal = dict(zip(names, (float(v) for v in vals)))
                dt = time.time() - t0
                scal["rays_per_sec"] = rays_done / max(dt, 1e-9)
                recorder.update(scal, step=step + 1)
                t0 = time.time()
                rays_done = 0
                last_metrics = scal
            if (step + 1) % tc.record_interval == 0:
                recorder.record("train")
                epoch = (step + 1) // tc.ep_iter
                log(recorder.log_line(epoch, tc.epochs, float(lr_sched(step))))
            if (step + 1) % (tc.save_ep * tc.ep_iter) == 0 or step + 1 == total_steps:
                save_model(state, ckpt_dir, step + 1)
            if (step + 1) % (tc.eval_ep * tc.ep_iter) == 0:
                res = _eval_now(eval_params(state))
                log(f"eval@{step + 1}: " + ", ".join(
                    f"{k}={v:.3f}" for k, v in res.items() if np.isscalar(v)))
                # Metric-selected checkpoint (train.save_best): when instances
                # are evaluated the selection metric averages mIoU and PQ
                # (both are the label-transfer headline); mIoU alone when only
                # semantics are, PSNR otherwise. Restore with
                # `train.eval_step -1`.
                if "miou" in res and "pq" in res:
                    val, kind = 0.5 * (float(res["miou"]) + float(res["pq"])), "miou_pq_mean"
                elif "miou" in res:
                    val, kind = res["miou"], "miou"
                else:
                    val, kind = res.get("psnr"), "psnr"
                if best_kind == "legacy" and kind != "miou_pq_mean":
                    # unrecorded pre-round-3 metric: single-metric values
                    # stay comparable, so adopt the current kind. Against
                    # the (mIoU+PQ)/2 mean an old mIoU-only value would win
                    # forever (PQ <= mIoU) — that case falls through to the
                    # mismatch reset below.
                    best_kind = kind
                if best_kind is not None and kind != best_kind:
                    log(f"best-metric sidecar used {best_kind!r}, this run "
                        f"selects on {kind!r} — resetting best state")
                    best_val = -np.inf
                best_kind = kind
                if tc.save_best and val is not None and float(val) > best_val:
                    best_val = float(val)
                    best_kind = kind
                    save_model(state, cfg.best_model_dir, step + 1,
                               max_to_keep=1)
                    if lead:
                        import json

                        with open(best_meta_path, "w") as f:
                            json.dump({"value": best_val, "step": step + 1,
                                       "metric": kind}, f)
                    log(f"new best eval metric {best_val:.4f} -> saved best@{step + 1}")
        save_model(state, ckpt_dir, total_steps)
    finally:
        # Always restore the previous SIGTERM handler — callers like
        # tools/run_staged.py invoke run_train repeatedly in one process,
        # and a stale handler (closing over a dead `preempted` dict) would
        # silently swallow real preemption signals between stages. The
        # recorder closes here too so a mid-loop exception (NaN abort,
        # KeyboardInterrupt) still flushes the JSONL/TensorBoard streams.
        signal.signal(signal.SIGTERM, prev_handler)
        recorder.close()
    return {"state": state, "model": model, "ds": eval_ds, "test_ids": test_ids,
            "metrics": last_metrics}


def make_lr(cfg: Config):
    from panopticnerf_tpu.train import make_lr_schedule

    return make_lr_schedule(cfg)


def _restore_for_eval(cfg: Config):
    ds, train_ids, test_ids, model, state = _build(cfg)
    directory = cfg.trained_model_dir
    want = cfg.train.eval_step or None
    if cfg.train.eval_step == -1:  # metric-selected checkpoint (save_best)
        directory = cfg.best_model_dir
        if not os.path.isdir(directory):
            # runs recorded before the best root moved beside the step root
            legacy = os.path.join(cfg.trained_model_dir, "best")
            if os.path.isdir(legacy):
                directory = legacy
        want = None
    params, step = load_network(state.params, directory, step=want,
                                prefer_ema=cfg.train.ema_decay > 0)
    return ds, test_ids, model, params, step


def run_evaluate(cfg: Config, log=print) -> dict:
    """Reference protocol (SURVEY.md §3.2): label-transfer mIoU/PQ are
    measured on the manually-annotated frames (which belong to the training
    sequence — the task IS annotating it); PSNR additionally on the held-out
    test views."""
    _, log = _lead_log(log)
    ds, test_ids, model, params, step = _restore_for_eval(cfg)
    ev = make_evaluator(cfg)
    mesh = _eval_mesh(cfg)
    render = jax.jit(lambda p, v: _render_view(cfg, model, p, ds, v, mesh=mesh))

    sem_views = []
    if ds.gt_sem is not None:
        has_gt = np.asarray((ds.gt_sem != 255).any(axis=(1, 2)))
        sem_views = np.nonzero(has_gt)[0].tolist()
    views = sorted(set(sem_views) | set(int(v) for v in test_ids))
    psnr_views = set(int(v) for v in test_ids)

    for view in views:
        out = render(params, int(view))
        gt_rgb = (np.asarray(ds.images[view], np.float32).reshape(-1, 3) / 255.0
                  if view in psnr_views else None)
        gt_sem = np.asarray(ds.gt_sem[view]).reshape(-1) if ds.gt_sem is not None else None
        gt_inst = np.asarray(ds.gt_inst[view]).reshape(-1) if ds.gt_inst is not None else None
        valid = (np.asarray(ds.valid_mask[view]).reshape(-1)
                 if ds.valid_mask is not None else None)
        gt_depth = (np.asarray(ds.depth[view]).reshape(-1)
                    if ds.depth is not None and view in psnr_views else None)
        ev.evaluate(out, gt_rgb, gt_sem, gt_inst, valid=valid,
                    gt_depth=gt_depth, image_hw=ds.images.shape[1:3])
    res = ev.summarize()
    names = None
    if cfg.model.num_classes == 19:
        from panopticnerf_tpu.data.labels import TRAINID_NAME

        names = TRAINID_NAME
    log(f"evaluate (ckpt step {step}):")
    log(ev.summary_table(names))
    return res


def _trajectory_poses(ds, n_frames: int):
    """Smooth camera path through the (perspective) training poses:
    translation lerp + rotation chord-lerp re-orthonormalized via SVD
    (equivalent to slerp for the small inter-frame angles of a driving
    sequence). Returns [(c2w 3x4, nearest view id), ...]."""
    c2w = np.asarray(ds.c2w, np.float64)
    ids = np.arange(c2w.shape[0])
    if ds.cam_model is not None:  # keep pinhole views only (fisheye poses jump)
        keep = np.asarray(ds.cam_model) == 0
        c2w, ids = c2w[keep], ids[keep]
    if c2w.shape[0] < 2:
        raise ValueError("trajectory rendering needs >= 2 perspective views")
    out = []
    for t in np.linspace(0.0, c2w.shape[0] - 1.0, n_frames):
        i = min(int(np.floor(t)), c2w.shape[0] - 2)
        a = t - i
        R = (1 - a) * c2w[i, :, :3] + a * c2w[i + 1, :, :3]
        u, _, vt = np.linalg.svd(R)
        R = u @ vt
        if np.linalg.det(R) < 0:
            R = u @ np.diag([1.0, 1.0, -1.0]) @ vt
        tr = (1 - a) * c2w[i, :, 3] + a * c2w[i + 1, :, 3]
        pose = np.concatenate([R, tr[:, None]], axis=1).astype(np.float32)
        out.append((pose, int(ids[int(round(t))])))
    return out


def render_trajectory(cfg: Config, model, params, ds, n_frames: int,
                      mesh=None):
    """Render novel interpolated poses (the reference's demo-video path).

    Intrinsics and the visible-primitive table come from the nearest
    training view; rays are regenerated for the interpolated pose, so this
    exercises true novel-view synthesis + label transfer off the pose rail.
    Yields (frame_index, nearest_view, RenderOut).
    """
    from panopticnerf_tpu.ops.rays import gen_rays_perspective

    h, w = ds.images.shape[1:3]
    vv, uu = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(jnp.float32) + 0.5
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)

    @jax.jit
    def render_pose(params, K, c2w, view):
        o, d = gen_rays_perspective(uv, K, c2w)
        prims = view_primitives(ds, view) if cfg.render.use_primitives else None
        return _intersect_and_render(cfg, model, params, o, d, prims, bounds,
                                     mesh=mesh)

    for i, (pose, near_view) in enumerate(_trajectory_poses(ds, n_frames)):
        yield i, near_view, render_pose(params, ds.K[near_view],
                                        jnp.asarray(pose), near_view)


def run_visualize(cfg: Config, log=print, panorama_hw: tuple | None = None,
                  trajectory: int = 0) -> list:
    from panopticnerf_tpu.viz import Visualizer

    # Multi-host: every process renders (the sharded render is a collective
    # program) but only process 0 writes files.
    lead, log = _lead_log(log)
    ds, test_ids, model, params, step = _restore_for_eval(cfg)
    viz = Visualizer(cfg)
    ev = make_evaluator(cfg)
    mesh = _eval_mesh(cfg)
    render = jax.jit(lambda p, v: _render_view(cfg, model, p, ds, v, mesh=mesh))
    written = []
    h, w = ds.images.shape[1:3]
    for view in test_ids:
        out = render(params, int(view))
        if not lead:
            continue  # the render is the collective part; evaluate is host work
        sem, inst = ev.evaluate(out)
        written += viz.write_view(int(view), out, (h, w), sem=sem, inst=inst)
        if sem is not None and inst is not None:
            written += viz.write_label_transfer(int(view), sem, inst, (h, w))
    if trajectory > 0:
        # Novel-pose demo video: smooth path through the training poses
        # (ids 2e6+ so the frames sort after the per-view outputs).
        for i, near_view, out in render_trajectory(cfg, model, params, ds,
                                                   trajectory, mesh=mesh):
            if lead:
                sem_t, inst_t = ev.evaluate(out)
                written += viz.write_view(2_000_000 + i, out, (h, w),
                                          sem=sem_t, inst=inst_t)
        log(f"trajectory: rendered {trajectory} interpolated poses")
    if panorama_hw is not None:
        # 360-degree label transfer: one panorama at the middle test view
        from panopticnerf_tpu.render import render_panorama

        eval_model = _eval_model(cfg, model)
        view = int(test_ids[len(test_ids) // 2])
        pano = jax.jit(
            lambda p: render_panorama(eval_model, p, ds, view, panorama_hw, cfg)
        )(params)
        if lead:
            sem_p, inst_p = ev.evaluate(pano)
            written += viz.write_view(
                1_000_000 + view, pano, panorama_hw, sem=sem_p, inst=inst_p
            )
    for suffix, name in (("_rgb.png", "rgb.mp4"), ("_semantic.png", "semantic.mp4"),
                         ("_panoptic.png", "panoptic.mp4")):
        v = viz.write_video(suffix, name) if lead else None
        if v:
            written.append(v)
    log(f"wrote {len(written)} files under {cfg.result_path}")
    return written


def run_network(cfg: Config, iters: int = 50, log=print) -> dict:
    """Throughput probe (reference run.py --type network, SURVEY.md §3.5)."""
    ds, train_ids, test_ids, model, state = _build(cfg)
    step_fn = _make_step(cfg, model, log=log, donate=False)
    view_ids = jnp.asarray(train_ids)
    key = jax.random.key(0)
    # warmup/compile
    state2, stats = step_fn(state, ds, view_ids, key)
    float(stats["loss_total"])
    t0 = time.time()
    s = state
    for i in range(iters):
        s, stats = step_fn(s, ds, view_ids, key)
    float(stats["loss_total"])  # true sync through the axon relay
    dt = time.time() - t0
    rays_per_sec = cfg.data.n_rays * iters / dt
    log(f"train-step throughput: {iters} iters in {dt:.2f}s -> "
        f"{rays_per_sec:,.0f} rays/s ({iters / dt:.1f} it/s)")
    return {"rays_per_sec": rays_per_sec, "iters_per_sec": iters / dt}
