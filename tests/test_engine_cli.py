"""Engine smoke tests: train -> evaluate -> visualize through the real entry
paths (tiny sizes, CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.engine import run_evaluate, run_train, run_visualize


def tiny_cfg(tmp_path, **over):
    cfg = Config()
    cfg.exp_name = "enginetest"
    cfg.model_dir = str(tmp_path / "models")
    cfg.record_dir = str(tmp_path / "records")
    cfg.result_dir = str(tmp_path / "results")
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 6
    cfg.data.synthetic_num_boxes = 3
    cfg.data.n_rays = 64
    cfg.data.max_primitives = 4
    cfg.data.max_intervals = 2
    cfg.data.test_every = 3
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.num_classes = 4
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    cfg.render.ray_tile = 128
    cfg.train.lr = 5e-3
    cfg.train.max_steps = 100
    cfg.train.ep_iter = 10
    cfg.train.log_interval = 10
    cfg.train.record_interval = 20
    cfg.train.save_ep = 100
    cfg.train.eval_ep = 1000
    cfg.train.resume = False
    for k, v in over.items():
        setattr(cfg.train, k, v) if hasattr(cfg.train, k) else None
    return cfg


def test_train_eval_visualize_roundtrip(tmp_path):
    cfg = tiny_cfg(tmp_path)
    logs = []
    res = run_train(cfg, max_steps=30, log=logs.append)
    assert "loss_total" in res["metrics"]
    assert any("epoch" in l for l in logs)
    # metrics jsonl written
    assert os.path.exists(os.path.join(cfg.record_path, "metrics.jsonl"))

    # resume: picks up from step 30
    cfg.train.resume = True
    logs2 = []
    run_train(cfg, max_steps=40, log=logs2.append)
    assert any("resumed from step 30" in l for l in logs2)

    ev = run_evaluate(cfg, log=logs.append)
    assert "psnr" in ev and "miou" in ev

    files = run_visualize(cfg, log=logs.append, panorama_hw=(8, 16))
    names = [os.path.basename(f) for f in files]
    assert any("panoptic" in n for n in names)
    assert any(n.startswith("1000") for n in names)  # panorama written


def test_run_py_help():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "run.py", "--help"], capture_output=True,
                         text=True, env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0
    assert "evaluate" in out.stdout and "network" in out.stdout


def test_warm_start_and_eval_step(tmp_path):
    """train.init_from loads weights from another exp; eval_step pins a ckpt."""
    import jax
    import numpy as np

    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "stage1"
    run_train(cfg, max_steps=5)
    stage1_dir = cfg.trained_model_dir

    cfg2 = tiny_cfg(tmp_path)
    cfg2.exp_name = "stage2"
    cfg2.train.init_from = stage1_dir
    logs = []
    run_train(cfg2, max_steps=3, log=logs.append)
    assert any("warm-started" in l for l in logs)

    # eval a pinned step
    cfg2.train.eval_step = 3
    res = run_evaluate(cfg2, log=logs.append)
    assert "psnr" in res


def test_save_best_and_eval_step_best(tmp_path):
    """train.save_best keeps a metric-selected checkpoint restorable via
    train.eval_step -1 (BASELINE.md long-run remedy)."""
    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "bestckpt"
    cfg.train.eval_ep = 1           # eval (and best-check) every ep_iter=10
    logs = []
    run_train(cfg, max_steps=20, log=logs.append)
    # best checkpoint root is a SIBLING of the orbax step root (ADVICE r2):
    # nothing non-step may live inside the step root.
    assert os.path.isdir(cfg.best_model_dir), logs
    assert not os.path.exists(os.path.join(cfg.trained_model_dir, "best"))
    assert not os.path.exists(
        os.path.join(cfg.trained_model_dir, "best_metric.json"))
    assert any("saved best@" in l for l in logs)

    cfg.train.eval_step = -1
    res = run_evaluate(cfg, log=logs.append)
    assert "psnr" in res
    assert any("ckpt step" in l for l in logs)


def test_ema_through_engine_paths(tmp_path):
    """train.ema_decay end to end: the in-train eval + save_best select on
    EMA weights, run_evaluate restores them (prefer_ema), and a warm start
    re-seeds the average at the loaded weights (not the fresh init)."""
    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "emarun"
    cfg.train.ema_decay = 0.9
    cfg.train.eval_ep = 1           # trigger the in-train EMA eval path
    logs = []
    res = run_train(cfg, max_steps=20, log=logs.append)
    assert res["state"].ema_params is not None
    assert any("eval@" in l for l in logs)

    ev = run_evaluate(cfg, log=logs.append)   # prefer_ema restore
    assert "psnr" in ev

    cfg2 = tiny_cfg(tmp_path)
    cfg2.exp_name = "emawarm"
    cfg2.train.ema_decay = 0.9
    cfg2.train.init_from = cfg.trained_model_dir
    logs2 = []
    res2 = run_train(cfg2, max_steps=3, log=logs2.append)
    assert any("warm-started" in l for l in logs2)
    # after 3 warmup-corrected steps the average must sit near the warm
    # weights, far from anything a fresh-init anchor would produce
    import jax

    p = np.asarray(jax.tree.leaves(res2["state"].params)[0])
    e = np.asarray(jax.tree.leaves(res2["state"].ema_params)[0])
    assert np.abs(e - p).max() < 0.05


def test_engine_routes_through_mesh_when_multidevice(tmp_path):
    """run_train auto-dispatches to the mesh-parallel pjit step when more
    than one device is visible (8 virtual CPU devices in tests)."""
    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "meshtrain"
    logs = []
    run_train(cfg, max_steps=3, log=logs.append)
    assert any("data-parallel over 8 devices" in l for l in logs), logs[:5]


def test_best_metric_survives_resume(tmp_path):
    """Resume must restore best-metric state — otherwise the first
    post-resume eval (> -inf) would clobber the true best checkpoint."""
    import json

    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "bestresume"
    cfg.train.eval_ep = 1
    logs = []
    run_train(cfg, max_steps=10, log=logs.append)
    meta = cfg.best_metric_path
    assert os.path.exists(meta)

    # Pretend an earlier (pre-preemption) eval was much better. The sidecar
    # records which metric the value was computed with; same-kind values
    # stay authoritative across resume.
    kind = json.load(open(meta))["metric"]
    json.dump({"value": 1e9, "step": 10, "metric": kind}, open(meta, "w"))
    cfg.train.resume = True
    logs2 = []
    run_train(cfg, max_steps=20, log=logs2.append)
    assert any("best-metric state restored" in l for l in logs2)
    assert not any("saved best@" in l for l in logs2)  # nothing beat 1e9
    assert json.load(open(meta))["value"] == 1e9

    # A legacy sidecar (no metric name, pre-round-3) was written by
    # single-metric selection — against (mIoU+PQ)/2 it is incomparable
    # (an mIoU-only 'best' would win forever), so selection starts afresh.
    json.dump({"value": 1e9, "step": 10}, open(meta, "w"))
    logs3 = []
    run_train(cfg, max_steps=30, log=logs3.append)
    assert any("resetting best state" in l for l in logs3)
    assert any("saved best@" in l for l in logs3)
    assert json.load(open(meta))["metric"] == kind
    assert json.load(open(meta))["value"] < 1e9


def test_misspelled_flag_rejected():
    """A leftover --token is a misspelled flag, not a KEY VALUE override —
    the CLIs must fail with argparse's clear error, not a config KeyError."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "run.py", "--type", "evaluate", "--trajectoy", "30"],
        capture_output=True, text=True, env=env, cwd=root)
    assert out.returncode != 0
    assert "unrecognized flag" in out.stderr and "--trajectoy" in out.stderr


def test_eval_views_knob(tmp_path):
    """train.eval_views widens the in-train eval behind save_best; 0 = all
    test views. (A 2-view eval makes 'best' selection noisy — VERDICT r2.)"""
    from panopticnerf_tpu.config import Config as C

    assert C().train.eval_views == 8  # default is wide, not 2
    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "evalviews"
    cfg.train.eval_ep = 1
    cfg.train.eval_views = 0  # all test views
    logs = []
    run_train(cfg, max_steps=10, log=logs.append)
    assert any("eval@10" in l for l in logs)


def test_trajectory_visualize(tmp_path):
    """--trajectory N renders interpolated novel poses (demo-video path)."""
    import numpy as np

    from panopticnerf_tpu.engine import _trajectory_poses

    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "traj"
    run_train(cfg, max_steps=5)
    files = run_visualize(cfg, log=lambda *_: None, trajectory=4)
    names = [os.path.basename(f) for f in files]
    assert sum(n.startswith("2000") and n.endswith("_rgb.png") for n in names) == 4

    # poses are valid rotations and the path hits the endpoints
    from panopticnerf_tpu.data import make_dataset

    ds, _, _ = make_dataset(cfg)
    poses = _trajectory_poses(ds, 5)
    for c2w, near in poses:
        R = c2w[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0
    np.testing.assert_allclose(poses[0][0], np.asarray(ds.c2w[0]), atol=1e-5)


def test_trajectory_poses_filter_fisheye():
    """Mixed perspective+fisheye datasets interpolate over perspective poses
    only (fisheye extrinsics jump sideways and would wreck the path)."""
    import numpy as np

    from panopticnerf_tpu.data import make_dataset
    from panopticnerf_tpu.engine import _trajectory_poses

    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 4
    cfg.data.synthetic_fisheye = True
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.num_classes = 4
    cfg.render.use_primitives = True
    ds, _, _ = make_dataset(cfg)
    assert ds.cam_model is not None
    persp = np.nonzero(np.asarray(ds.cam_model) == 0)[0]
    poses = _trajectory_poses(ds, 6)
    for c2w, near in poses:
        assert near in persp  # nearest view is always a pinhole view
        np.testing.assert_allclose(c2w[:, :3] @ c2w[:, :3].T, np.eye(3),
                                   atol=1e-5)


def test_warm_start_across_coarse_topology(tmp_path):
    """Warm start from a full-coarse checkpoint into a proposal-coarse model
    (model.coarse_trunk_depth/width): the fine field merges, the resized
    coarse trunk keeps fresh init (shape-mismatch fallback), and training
    proceeds — so a staged chain may switch coarse sizes mid-pipeline."""
    import warnings

    cfg = tiny_cfg(tmp_path)
    cfg.exp_name = "fullcoarse"
    cfg.render.n_importance = 8
    run_train(cfg, max_steps=5)

    cfg2 = tiny_cfg(tmp_path)
    cfg2.exp_name = "propcoarse"
    cfg2.render.n_importance = 8
    cfg2.model.coarse_trunk_depth = 1
    cfg2.model.coarse_trunk_width = 8
    cfg2.train.init_from = cfg.trained_model_dir
    logs = []
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        run_train(cfg2, max_steps=3, log=logs.append)
    assert any("warm-started" in l for l in logs)
    merged = [w for w in ws if "merged" in str(w.message)]
    assert merged, [str(w.message) for w in ws]  # partial, not full, merge
