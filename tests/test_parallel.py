"""Sharded-training tests on the 8-virtual-CPU-device mesh (conftest env)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.parallel import make_mesh, make_parallel_train_step
from panopticnerf_tpu.train import make_train_state, make_train_step


def _cfg():
    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 4
    cfg.data.synthetic_num_boxes = 3
    cfg.data.n_rays = 64
    cfg.data.max_primitives = 4
    cfg.data.max_intervals = 2
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.num_classes = 4
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    return cfg


def test_mesh_uses_all_devices():
    cfg = _cfg()
    mesh = make_mesh(cfg)
    assert mesh.devices.size == 8  # conftest forces 8 virtual cpu devices


def test_mesh_respects_requested_size():
    cfg = _cfg()
    cfg.parallel.data_parallel = 4
    assert make_mesh(cfg).devices.size == 4
    cfg.parallel.data_parallel = 99
    with pytest.raises(ValueError):
        make_mesh(cfg)


def test_parallel_step_matches_single_device():
    """Same PRNG key -> sharded step must reproduce single-device numerics."""
    cfg = _cfg()
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    view_ids = jnp.arange(4)
    key = jax.random.key(5)

    s1 = make_train_state(cfg, model, params)
    single = make_train_step(cfg, model, donate=False)
    s1b, stats1 = single(s1, ds, view_ids, key)

    mesh = make_mesh(cfg)
    s2 = make_train_state(cfg, model, params)
    par = make_parallel_train_step(cfg, model, mesh, donate=False)
    s2b, stats2 = par(s2, ds, view_ids, key)

    np.testing.assert_allclose(
        float(stats1["loss_total"]), float(stats2["loss_total"]), rtol=1e-4
    )
    a = jax.tree.leaves(s1b.params)[0]
    b = jax.tree.leaves(s2b.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_parallel_step_trains():
    cfg = _cfg()
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    mesh = make_mesh(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_parallel_train_step(cfg, model, mesh, donate=False)
    key = jax.random.key(0)
    view_ids = jnp.arange(4)
    losses = []
    for i in range(20):
        key, sub = jax.random.split(key)
        state, stats = step(state, ds, view_ids, sub)
        losses.append(float(stats["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_rays_not_divisible_raises():
    cfg = _cfg()
    cfg.data.n_rays = 13
    mesh = make_mesh(cfg)
    model = make_network(cfg)
    with pytest.raises(ValueError):
        make_parallel_train_step(cfg, model, mesh)


def test_sharded_image_render_matches_single():
    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.ops import intersect_rays
    from panopticnerf_tpu.parallel import render_image_rays_sharded
    from panopticnerf_tpu.render import SceneBounds, render_image_rays

    cfg = _cfg()
    cfg.render.ray_tile = 32
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    o, d = view_rays(ds, 1)
    prims = view_primitives(ds, 1)
    iv = intersect_rays(o, d, prims, cfg.render.near, cfg.render.far,
                        cfg.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)
    mesh = make_mesh(cfg)

    ref = jax.jit(lambda p: render_image_rays(model, p, o, d, bounds, cfg, iv=iv))(params)
    out = jax.jit(
        lambda p: render_image_rays_sharded(model, p, o, d, bounds, cfg, mesh, iv=iv)
    )(params)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.sem_fixed), np.asarray(ref.sem_fixed), atol=1e-5)


def test_parallel_step_forces_kernels_off():
    """With parallel.kernel_shard_map False (legacy escape hatch) the Pallas
    kernels are disabled on a >1-device mesh and the XLA fallback reproduces
    the kernels-off numerics exactly. (The intersection kernel always falls
    back under GSPMD — its grouped reshape does not commute with ray
    sharding.)"""
    cfg = _cfg()
    cfg.data.views_per_batch = 4
    cfg.model.use_pallas = True
    cfg.render.use_pallas_intersect = True
    cfg.parallel.kernel_shard_map = False
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    mesh = make_mesh(cfg)
    view_ids = jnp.arange(4)
    key = jax.random.key(5)

    with pytest.warns(UserWarning, match="kernel disabled"):
        par = make_parallel_train_step(cfg, model, mesh, donate=False)
    s1, stats1 = par(make_train_state(cfg, model, params), ds, view_ids, key)

    cfg_off = _cfg()
    cfg_off.data.views_per_batch = 4
    off = make_parallel_train_step(cfg_off, model, mesh, donate=False)
    s2, stats2 = off(make_train_state(cfg_off, model, params), ds, view_ids, key)

    np.testing.assert_allclose(float(stats1["loss_total"]),
                               float(stats2["loss_total"]), rtol=1e-6)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_shard_map_kernel_step_matches_single_device():
    """With kernel_shard_map (default), use_pallas stays ON across the mesh
    via a manual-SPMD region. With perturb off (deterministic sampling) the
    loss/params must match the single-device kernel step to float tolerance
    (losses are exact global masked means via psum)."""
    cfg = _cfg()
    cfg.data.views_per_batch = 4
    cfg.model.use_pallas = True
    cfg.render.perturb = False
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    view_ids = jnp.arange(4)
    key = jax.random.key(5)

    single = make_train_step(cfg, model, donate=False)
    s1, stats1 = single(make_train_state(cfg, model, params), ds, view_ids, key)

    mesh = make_mesh(cfg)
    par = make_parallel_train_step(cfg, model, mesh, donate=False)
    s2, stats2 = par(make_train_state(cfg, model, params), ds, view_ids, key)

    np.testing.assert_allclose(float(stats1["loss_total"]),
                               float(stats2["loss_total"]), rtol=1e-5)
    for k in stats1:
        np.testing.assert_allclose(float(stats1[k]), float(stats2[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    a = jnp.concatenate([x.ravel() for x in jax.tree.leaves(s1.params)])
    b = jnp.concatenate([x.ravel() for x in jax.tree.leaves(s2.params)])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("g", [8, 16, 4])
def test_shard_map_intersect_kernel_matches_single_device(g):
    """The grouped Pallas INTERSECTION kernel now runs inside the shard_map
    region whenever the ray sharding respects view-group boundaries: whole
    groups per device (G % n_dev == 0: G=8, 16) or one-group slices
    (n_dev % G == 0: G=4). Deterministic sampling -> the mesh step must
    reproduce the single-device kernel step and emit NO fallback warning."""
    import warnings as _w

    cfg = _cfg()
    cfg.data.views_per_batch = g
    cfg.data.n_rays = 64
    cfg.render.use_pallas_intersect = True
    cfg.render.perturb = False
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    view_ids = jnp.arange(4)
    key = jax.random.key(5)

    single = make_train_step(cfg, model, donate=False)
    s1, stats1 = single(make_train_state(cfg, model, params), ds, view_ids, key)

    mesh = make_mesh(cfg)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)  # no kernel-disabled warning
        par = make_parallel_train_step(cfg, model, mesh, donate=False)
    s2, stats2 = par(make_train_state(cfg, model, params), ds, view_ids, key)

    np.testing.assert_allclose(float(stats1["loss_total"]),
                               float(stats2["loss_total"]), rtol=1e-5)
    a = jnp.concatenate([x.ravel() for x in jax.tree.leaves(s1.params)])
    b = jnp.concatenate([x.ravel() for x in jax.tree.leaves(s2.params)])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_shard_map_intersect_kernel_incompatible_group_falls_back():
    """G=3 with 8 devices splits groups across shards — the kernel must
    fall back to XLA with the explanatory warning (never silent)."""
    cfg = _cfg()
    cfg.data.views_per_batch = 3
    cfg.data.n_rays = 48
    cfg.render.use_pallas_intersect = True
    model = make_network(cfg)
    mesh = make_mesh(cfg)
    with pytest.warns(UserWarning, match="intersection kernel disabled"):
        make_parallel_train_step(cfg, model, mesh, donate=False)


def test_shard_map_kernel_step_trains():
    """Perturb ON (per-device decorrelated jitter): the shard_map kernel
    step must train (finite, decreasing loss)."""
    cfg = _cfg()
    cfg.data.views_per_batch = 4
    cfg.model.use_pallas = True
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    mesh = make_mesh(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_parallel_train_step(cfg, model, mesh, donate=False)
    key = jax.random.key(0)
    losses = []
    for i in range(15):
        key, sub = jax.random.split(key)
        state, stats = step(state, ds, jnp.arange(4), sub)
        losses.append(float(stats["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# ------------------------- round-5: the paths real slices run (VERDICT #6)
def _kitti_cfg(root, n_rays=64):
    cfg = Config()
    cfg.data.dataset = "kitti360"
    cfg.data.root = root
    cfg.data.frame_start = 0
    cfg.data.frame_num = 2
    cfg.data.test_every = 4
    cfg.data.max_primitives = 16
    cfg.data.max_intervals = 8
    cfg.data.n_rays = n_rays
    cfg.data.views_per_batch = 2
    cfg.model.num_classes = 19
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    return cfg


def test_parallel_step_mixed_fisheye_matches_single(tmp_path):
    """Joint perspective+fisheye mixed-batch step (the kitti360_360 path)
    through the mesh must reproduce single-device numerics — per-ray MEI
    unprojection and FOV-circle validity masking included."""
    import os

    from panopticnerf_tpu.data.demo_tree import write_demo_tree
    from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset

    root = str(tmp_path / "fe")
    os.makedirs(root)
    write_demo_tree(root, n_frames=2, hw=(16, 24), n_boxes=3, seed=3,
                    label_noise=0.0, fisheye=True)
    cfg = _kitti_cfg(root)
    cfg.data.use_fisheye = True
    ds = build_kitti360_dataset(cfg)
    assert int(np.asarray(ds.cam_model).max()) == 1  # fisheye views present
    view_ids = jnp.arange(ds.images.shape[0])
    key = jax.random.key(11)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))

    s1 = make_train_state(cfg, model, params)
    s1b, stats1 = make_train_step(cfg, model, donate=False)(s1, ds, view_ids, key)

    mesh = make_mesh(cfg)
    s2 = make_train_state(cfg, model, params)
    par = make_parallel_train_step(cfg, model, mesh, donate=False)
    s2b, stats2 = par(s2, ds, view_ids, key)

    np.testing.assert_allclose(
        float(stats1["loss_total"]), float(stats2["loss_total"]), rtol=1e-4)
    a = jax.tree.leaves(s1b.params)[0]
    b = jax.tree.leaves(s2b.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_parallel_step_multi_sequence_stream_window(tmp_path):
    """Multi-sequence pool + HBM stream window + mesh step (the config-5
    slice path): windows rotate under the SAME jitted parallel step (equal
    shapes, no recompile), losses stay finite."""
    import os

    from panopticnerf_tpu.data import make_dataset
    from panopticnerf_tpu.data.demo_tree import write_demo_tree
    from panopticnerf_tpu.data.stream import HostViews, ViewWindowStreamer

    root = str(tmp_path / "ms")
    os.makedirs(root)
    write_demo_tree(root, n_frames=2, hw=(16, 24), n_boxes=3, seed=0,
                    label_noise=0.0, seq="2013_05_28_drive_0000_sync")
    write_demo_tree(root, n_frames=2, hw=(16, 24), n_boxes=3, seed=1,
                    label_noise=0.0, seq="2013_05_28_drive_0002_sync")
    cfg = _kitti_cfg(root)
    cfg.data.sequences = ["2013_05_28_drive_0000_sync",
                          "2013_05_28_drive_0002_sync"]
    cfg.data.stream_window = 4
    ds, train_ids, _ = make_dataset(cfg)
    assert ds.images.shape[0] == 8  # 2 seq x 2 frames x stereo

    streamer = ViewWindowStreamer(HostViews.from_device(ds), 4, seed=0,
                                  include=train_ids)
    ds_w, ids = streamer.current()
    assert ds_w.images.shape[0] == 4

    model = make_network(cfg)
    mesh = make_mesh(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    par = make_parallel_train_step(cfg, model, mesh, donate=False)
    view_ids = jnp.arange(4)
    losses = []
    for i in range(3):
        state, stats = par(state, ds_w, view_ids, jax.random.key(i))
        losses.append(float(stats["loss_total"]))
        ds_w, ids = streamer.advance()
        assert ds_w.images.shape[0] == 4
    assert streamer.refreshes == 3
    assert np.isfinite(losses).all()
