"""Consistency tests for the raycast demo KITTI tree (data/demo_tree.py).

The tree exists to be a QUALITY proxy: every stream is derived from one
raycast scene, so the loader's interval intersection, depth conversion, and
fixed semantic field must all agree with the written GT. These tests pin
that agreement — if they hold, a staged run's final mIoU measures the
pipeline, not fixture inconsistency (the round-2 0.53-mIoU gap).
"""

import os

import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.demo_tree import write_demo_tree
from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset


@pytest.fixture(scope="module")
def demo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demokitti"))
    write_demo_tree(root, n_frames=4, hw=(32, 48), n_boxes=4, seed=0,
                    label_noise=0.0, depth_keep=1.0)
    return root


def _cfg(root):
    cfg = Config()
    cfg.data.dataset = "kitti360"
    cfg.data.root = root
    cfg.data.frame_start = 0
    cfg.data.frame_num = 4
    cfg.data.max_primitives = 16
    cfg.data.max_intervals = 8
    cfg.data.test_every = 4
    cfg.model.num_classes = 19
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    return cfg


def test_streams_load(demo_root):
    ds = build_kitti360_dataset(_cfg(demo_root))
    assert ds.images.shape == (8, 32, 48, 3)  # 4 frames x stereo
    assert ds.gt_sem is not None and ds.gt_inst is not None
    assert bool(ds.prim_valid.any())
    assert float(ds.depth.max()) > 0


def test_depth_roundtrip_matches_intersection(demo_root):
    """sgm is written PLANE-Z; the loader converts to ray distance; the
    nearest ray/primitive interval entry must reproduce it (the raycaster
    and the interval intersection see the same boxes)."""
    import jax.numpy as jnp

    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.ops import intersect_rays

    cfg = _cfg(demo_root)
    ds = build_kitti360_dataset(cfg)
    o, d = view_rays(ds, 0)
    iv = intersect_rays(o, d, view_primitives(ds, 0), cfg.render.near,
                        cfg.render.far, cfg.data.max_intervals)
    t_near = np.where(np.asarray(iv.mask).any(1),
                      np.asarray(iv.t_in).min(1, initial=np.inf,
                                              where=np.asarray(iv.mask)),
                      0.0)
    dep = np.asarray(ds.depth[0]).reshape(-1)
    has_dep = dep > 0
    assert has_dep.mean() > 0.3  # a solid fraction of the frame has depth
    covered = (t_near > 0) & np.isfinite(t_near)
    # every depth pixel (a raycast hit) lies on an intersected primitive
    assert covered[has_dep].mean() > 0.99
    both = has_dep & covered
    np.testing.assert_allclose(dep[both], t_near[both], rtol=2e-2, atol=0.15)


def test_nearest_interval_semantics_match_gt(demo_root):
    """Nearest-interval primitive semantics == GT semantic map on primitive
    pixels (both derive from the same scene): the fixed field AGREES with
    the supervision instead of contradicting it."""
    import jax.numpy as jnp

    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.ops import intersect_rays

    cfg = _cfg(demo_root)
    ds = build_kitti360_dataset(cfg)
    for view in (0, 2):
        o, d = view_rays(ds, view)
        iv = intersect_rays(o, d, view_primitives(ds, view), cfg.render.near,
                            cfg.render.far, cfg.data.max_intervals)
        mask = np.asarray(iv.mask)
        t_in = np.where(mask, np.asarray(iv.t_in), np.inf)
        nearest = t_in.argmin(1)
        sem = np.asarray(iv.semantic)[np.arange(len(nearest)), nearest]
        has = mask.any(1)
        gt = np.asarray(ds.gt_sem[view]).reshape(-1)
        prim_px = has & (gt != 255) & (gt != 10)  # off sky
        agree = (sem[prim_px] == gt[prim_px]).mean()
        assert agree > 0.97, f"view {view}: fixed/GT agreement {agree:.3f}"


def test_multi_sequence_demo_tree_trains(tmp_path):
    """BASELINE config 5 path on KITTI-format data: two demo sequences in
    one tree, concatenated by make_dataset (data.sequences), train one step
    + eval views exist from both sequences."""
    import jax
    import jax.numpy as jnp

    from panopticnerf_tpu.data import make_dataset
    from panopticnerf_tpu.data.demo_tree import write_demo_tree
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    root = str(tmp_path / "multi")
    os.makedirs(root)
    s1 = write_demo_tree(root, n_frames=2, hw=(32, 48), n_boxes=3, seed=0,
                         seq="2013_05_28_drive_0000_sync")
    s2 = write_demo_tree(root, n_frames=2, hw=(32, 48), n_boxes=3, seed=7,
                         seq="2013_05_28_drive_0002_sync")
    cfg = _cfg(root)
    cfg.data.frame_num = 2
    cfg.data.sequences = (s1, s2)
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 4
    cfg.data.n_rays = 64

    ds, train_ids, test_ids = make_dataset(cfg)
    assert ds.images.shape[0] == 8  # 2 seqs x 2 frames x stereo
    # scenes differ across sequences (different seeds)
    assert not np.array_equal(np.asarray(ds.prim_w2p[0]), np.asarray(ds.prim_w2p[4]))

    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    state2, stats = step(state, ds, jnp.asarray(train_ids), jax.random.key(1))
    assert np.isfinite(float(stats["loss_total"]))


def test_frame_start_offset_tree_loads(tmp_path):
    """A tree written with frame_start=3353 loads through the unmodified
    shipped-config window (data.frame_start 3353): the real KITTI-360
    training windows start mid-sequence, and the config-5 hardware record
    must run from the YAML without frame renumbering."""
    root = str(tmp_path / "offset")
    os.makedirs(root)
    write_demo_tree(root, n_frames=3, hw=(32, 48), n_boxes=3, seed=0,
                    label_noise=0.0, depth_keep=1.0, frame_start=3353)
    cfg = _cfg(root)
    cfg.data.frame_start = 3353
    cfg.data.frame_num = 3
    ds = build_kitti360_dataset(cfg)
    assert ds.images.shape[0] == 6  # 3 frames x stereo
    assert np.isfinite(np.asarray(ds.depth)).all()
    # GT streams found at the offset frame numbers (not silently empty)
    assert int(np.asarray(ds.gt_sem).max()) > 0


def test_fisheye_streams_consistent(tmp_path):
    """fisheye=True trees carry MEI image_02 streams consistent with the
    scene: the loader's yaml parse + pose path + `pixel_dirs` fisheye
    unprojection + interval intersection must reproduce the written
    (noise-free) pseudo-labels on in-FOV primitive pixels."""
    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.ops import intersect_rays

    root = str(tmp_path / "fe")
    os.makedirs(root)
    write_demo_tree(root, n_frames=2, hw=(32, 48), n_boxes=4, seed=3,
                    label_noise=0.0, fisheye=True)
    cfg = _cfg(root)
    cfg.data.frame_num = 2
    cfg.data.use_fisheye = True
    ds = build_kitti360_dataset(cfg)
    assert ds.images.shape[0] == 6            # 2 frames x (cam0+cam1+fe02)
    assert ds.cam_model is not None
    cam_m = np.asarray(ds.cam_model)
    assert (cam_m == 1).sum() == 2
    fe_view = int(np.flatnonzero(cam_m == 1)[0])
    vmask = np.asarray(ds.valid_mask[fe_view]).reshape(-1)
    assert 0.1 < vmask.mean() < 1.0           # FOV circle cuts the corners
    # fisheye view shares cam0's pose (identity c2p; poses.txt = cam0 pose)
    cam0_view = int(np.flatnonzero(cam_m == 0)[0])
    np.testing.assert_allclose(np.asarray(ds.c2w[fe_view]),
                               np.asarray(ds.c2w[cam0_view]), atol=1e-5)

    o, d = view_rays(ds, fe_view)
    iv = intersect_rays(o, d, view_primitives(ds, fe_view), cfg.render.near,
                        cfg.render.far, cfg.data.max_intervals)
    mask = np.asarray(iv.mask)
    t_in = np.where(mask, np.asarray(iv.t_in), np.inf)
    nearest = t_in.argmin(1)
    sem = np.asarray(iv.semantic)[np.arange(len(nearest)), nearest]
    has = mask.any(1)
    pseudo = np.asarray(ds.pseudo[fe_view]).reshape(-1)   # noise-free = GT
    px = has & vmask & (pseudo != 255) & (pseudo != 10)   # off sky/ignore
    assert px.sum() > 50
    agree = (sem[px] == pseudo[px]).mean()
    assert agree > 0.95, f"fisheye fixed/pseudo agreement {agree:.3f}"


def test_joint_fisheye_step_with_both_pallas_kernels(tmp_path):
    """The kitti360_360 execution path — grouped mixed perspective+fisheye
    batches — with BOTH Pallas kernels on must reproduce the XLA step's
    numerics (the -360 config ships with use_pallas + use_pallas_intersect;
    the kernels take world rays / points, so camera model is irrelevant to
    them, but this pins the full joint step end to end)."""
    import jax
    import jax.numpy as jnp

    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    root = str(tmp_path / "fe360")
    os.makedirs(root)
    write_demo_tree(root, n_frames=2, hw=(32, 48), n_boxes=4, seed=3,
                    label_noise=0.0, fisheye=True)
    cfg = _cfg(root)
    cfg.data.frame_num = 2
    cfg.data.use_fisheye = True
    cfg.data.n_rays = 64
    cfg.data.views_per_batch = 2
    cfg.model.trunk_depth = 3
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.skips = (1,)
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    ds = build_kitti360_dataset(cfg)
    assert np.asarray(ds.cam_model).max() == 1  # fisheye views present
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    key = jax.random.key(7)
    vids = jnp.arange(ds.images.shape[0])

    s_ref = make_train_state(cfg, model, params)
    stats_ref = make_train_step(cfg, model, donate=False)(s_ref, ds, vids, key)[1]

    cfg.model.use_pallas = True
    cfg.render.use_pallas_intersect = True
    s_pal = make_train_state(cfg, model, params)
    stats_pal = make_train_step(cfg, model, donate=False)(s_pal, ds, vids, key)[1]

    assert np.isfinite(float(stats_pal["loss_total"]))
    np.testing.assert_allclose(
        float(stats_pal["loss_total"]), float(stats_ref["loss_total"]), rtol=1e-4
    )


def test_pseudo_label_noise_and_gt_instances(demo_root, tmp_path):
    root = str(tmp_path / "noisy")
    os.makedirs(root)
    write_demo_tree(root, n_frames=2, hw=(32, 48), n_boxes=4, seed=1,
                    label_noise=0.1, depth_keep=0.5)
    cfg = _cfg(root)
    cfg.data.frame_num = 2
    ds = build_kitti360_dataset(cfg)
    ps = np.asarray(ds.pseudo[0])
    gt = np.asarray(ds.gt_sem[0])
    frac = (ps != gt).mean()
    assert 0.03 < frac < 0.25  # noise present but bounded
    # things carry instance ids; road does not
    gi = np.asarray(ds.gt_inst[0])
    car_or_bld = np.isin(gt, (13, 2))
    if car_or_bld.any():
        assert gi[car_or_bld].max() >= 1
    assert (gi[gt == 0] == 0).all()


def test_concave_building_streams_consistent(tmp_path):
    """n_concave>0 trees write each L-building as ONE concave 12-vertex
    extruded-polygon annotation while raycasting the two boxes that tile
    it: parse_bbox_xml's convex decomposition (ear-clip + merge) must
    reproduce the raycast geometry exactly for depth AND semantics."""
    from panopticnerf_tpu.data.annotation3d import parse_bbox_xml
    from panopticnerf_tpu.data.dataset import view_primitives, view_rays
    from panopticnerf_tpu.ops import intersect_rays

    root = str(tmp_path / "concave")
    os.makedirs(root)
    seq = write_demo_tree(root, n_frames=2, hw=(32, 48), n_boxes=3, seed=0,
                          label_noise=0.0, depth_keep=1.0, n_concave=2)

    # XML carries single concave annotations; parse decomposes each into
    # exactly 2 non-cuboid convex pieces sharing index/instance.
    boxes = parse_bbox_xml(f"{root}/data_3d_bboxes/train/{seq}.xml")
    from collections import Counter

    per_index = Counter(b.index for b in boxes)
    multi = [i for i, n in per_index.items() if n > 1]
    assert len(multi) == 2
    for i in multi:
        pieces = [b for b in boxes if b.index == i]
        assert len(pieces) == 2
        assert all(not b.is_cuboid for b in pieces)
        assert len({b.instance_id for b in pieces}) == 1
        assert all(b.label == "building" for b in pieces)

    cfg = _cfg(root)
    cfg.data.frame_num = 2
    ds = build_kitti360_dataset(cfg)
    o, d = view_rays(ds, 0)
    iv = intersect_rays(o, d, view_primitives(ds, 0), cfg.render.near,
                        cfg.render.far, cfg.data.max_intervals)
    mask = np.asarray(iv.mask)
    t_in = np.where(mask, np.asarray(iv.t_in), np.inf)
    nearest = t_in.argmin(1)
    sem = np.asarray(iv.semantic)[np.arange(len(nearest)), nearest]
    gt = np.asarray(ds.gt_sem[0]).reshape(-1)
    prim_px = mask.any(1) & (gt != 255) & (gt != 10)
    assert prim_px.sum() > 200
    agree = (sem[prim_px] == gt[prim_px]).mean()
    assert agree > 0.99, f"concave-tree fixed/GT agreement {agree:.3f}"

    # depth roundtrip through the decomposed pieces stays exact
    t_near = np.where(mask.any(1), np.asarray(iv.t_in).min(
        1, initial=np.inf, where=mask), 0.0)
    dep = np.asarray(ds.depth[0]).reshape(-1)
    both = (dep > 0) & (t_near > 0) & np.isfinite(t_near)
    np.testing.assert_allclose(dep[both], t_near[both], rtol=2e-2, atol=0.15)
