"""KITTI-360 loader tests against a generated miniature dataset tree."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.annotation3d import boxes_visible_in_frame, parse_bbox_xml
from panopticnerf_tpu.data.kitti360 import (
    build_kitti360_dataset,
    load_cam0_to_world,
    load_perspective_calib,
    stereo_right_c2w,
)

H, W = 24, 32
FRAMES = [100, 101, 102]


def _mat_xml(parent, name, arr):
    node = ET.SubElement(parent, name)
    ET.SubElement(node, "rows").text = str(arr.shape[0])
    ET.SubElement(node, "cols").text = str(arr.shape[1])
    ET.SubElement(node, "dt").text = "d"
    ET.SubElement(node, "data").text = " ".join(f"{v:.8f}" for v in arr.reshape(-1))


def make_fake_kitti(root):
    from PIL import Image

    seq = "2013_05_28_drive_0000_sync"
    os.makedirs(f"{root}/calibration", exist_ok=True)
    fx = 20.0
    with open(f"{root}/calibration/perspective.txt", "w") as f:
        P0 = f"{fx} 0 {W/2} 0 0 {fx} {H/2} 0 0 0 1 0"
        # right camera: P_rect_01[0,3] = -fx * baseline, baseline = 0.6
        P1 = f"{fx} 0 {W/2} {-fx*0.6} 0 {fx} {H/2} 0 0 0 1 0"
        f.write(f"P_rect_00: {P0}\nR_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_01: {P1}\nR_rect_01: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"S_rect_00: {W} {H}\n")
    with open(f"{root}/calibration/calib_cam_to_pose.txt", "w") as f:
        f.write("image_00: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        # left fisheye: 90deg yaw (looks along world -x from identity pose)
        f.write("image_02: 0 0 -1 0.5 0 1 0 0 1 0 0 0\n")

    # fisheye calibration (MEI), 40x40 native
    with open(f"{root}/calibration/image_02.yaml", "w") as f:
        f.write(
            "%YAML:1.0\n"
            "image_width: 40\nimage_height: 40\n"
            "mirror_parameters:\n   xi: 2.2\n"
            "distortion_parameters:\n   k1: 0.01\n   k2: -0.002\n"
            "projection_parameters:\n   gamma1: 35.0\n   gamma2: 35.0\n"
            "   u0: 20.0\n   v0: 20.0\n"
        )

    os.makedirs(f"{root}/data_poses/{seq}", exist_ok=True)
    with open(f"{root}/data_poses/{seq}/cam0_to_world.txt", "w") as f:
        for i, fr in enumerate(FRAMES):
            c2w = np.eye(4)
            c2w[0, 3] = i * 0.5  # camera moves along +x, looking +z
            vals = " ".join(f"{v:.6f}" for v in c2w.reshape(-1))
            f.write(f"{fr} {vals}\n")
    with open(f"{root}/data_poses/{seq}/poses.txt", "w") as f:
        for i, fr in enumerate(FRAMES):
            m = np.eye(4)
            m[0, 3] = i * 0.5
            vals = " ".join(f"{v:.6f}" for v in m[:3].reshape(-1))
            f.write(f"{fr} {vals}\n")

    # images: left = gradient + frame tint; right = same
    for cam in ("image_00", "image_01"):
        d = f"{root}/data_2d_raw/{seq}/{cam}/data_rect"
        os.makedirs(d, exist_ok=True)
        for i, fr in enumerate(FRAMES):
            img = np.zeros((H, W, 3), np.uint8)
            img[..., 0] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
            img[..., 1] = 50 * (i + 1)
            Image.fromarray(img).save(f"{d}/{fr:010d}.png")
    # fisheye images (native 40x40, loader resizes to perspective HW)
    d = f"{root}/data_2d_raw/{seq}/image_02/data_rgb"
    os.makedirs(d, exist_ok=True)
    for i, fr in enumerate(FRAMES):
        img = np.full((40, 40, 3), 30 * (i + 1), np.uint8)
        Image.fromarray(img).save(f"{d}/{fr:010d}.png")

    # 3D bboxes: one cuboid 'car' (8 verts), one extruded 'building' (12 verts)
    os.makedirs(f"{root}/data_3d_bboxes/train", exist_ok=True)
    rootel = ET.Element("opencv_storage")
    obj = ET.SubElement(rootel, "object_0")
    T1 = np.eye(4)
    T1[:3, :3] = np.diag([2.0, 1.0, 3.0])  # scale in transform
    T1[:3, 3] = [0, 0, 10]
    _mat_xml(obj, "transform", T1)
    cube = np.array([[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)])
    _mat_xml(obj, "vertices", cube)
    _mat_xml(obj, "faces", np.zeros((6, 4)))
    ET.SubElement(obj, "label").text = "car"
    ET.SubElement(obj, "semanticId").text = "26"
    ET.SubElement(obj, "instanceId").text = "1"
    ET.SubElement(obj, "index").text = "0"
    ET.SubElement(obj, "start_frame").text = "100"
    ET.SubElement(obj, "end_frame").text = "102"
    ET.SubElement(obj, "timestamp").text = "-1"
    ET.SubElement(obj, "dynamic").text = "0"

    obj2 = ET.SubElement(rootel, "object_1")
    T2 = np.eye(4)
    T2[:3, 3] = [5, 0, 12]
    _mat_xml(obj2, "transform", T2)
    # true extruded hexagon (two matching rings along y), non-cuboid
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    ring = np.stack([2 * np.cos(ang), 2 * np.sin(ang)], 1)
    poly = np.concatenate([
        np.stack([ring[:, 0], np.full(6, -1.0), ring[:, 1]], 1),
        np.stack([ring[:, 0], np.full(6, 1.0), ring[:, 1]], 1),
    ])
    _mat_xml(obj2, "vertices", poly)
    _mat_xml(obj2, "faces", np.zeros((8, 4)))
    ET.SubElement(obj2, "label").text = "building"
    ET.SubElement(obj2, "semanticId").text = "11"
    ET.SubElement(obj2, "instanceId").text = "2"
    ET.SubElement(obj2, "index").text = "1"
    ET.SubElement(obj2, "start_frame").text = "101"  # not visible at frame 100
    ET.SubElement(obj2, "end_frame").text = "102"
    ET.SubElement(obj2, "timestamp").text = "-1"
    ET.SubElement(obj2, "dynamic").text = "0"
    ET.ElementTree(rootel).write(f"{root}/data_3d_bboxes/train/{seq}.xml")

    # visible_id only for frame 102 (tests both paths)
    os.makedirs(f"{root}/visible_id/{seq}", exist_ok=True)
    with open(f"{root}/visible_id/{seq}/{102:010d}.txt", "w") as f:
        f.write("0\n")  # only the car

    # pspnet pseudo-labels (raw ids): road everywhere, car square.
    # image_02 (fisheye) gets vegetation everywhere so the -360 pseudo-label
    # branch is distinguishable from the perspective cams.
    for cam in ("image_00", "image_01", "image_02"):
        d = f"{root}/pspnet/{seq}/{cam}"
        os.makedirs(d, exist_ok=True)
        for fr in FRAMES:
            if cam == "image_02":
                lab = np.full((H, W), 21, np.int32)  # vegetation
            else:
                lab = np.full((H, W), 7, np.int32)   # road
                lab[5:10, 5:10] = 26                 # car
            np.save(f"{d}/{fr:010d}.npy", lab)

    # sgm depth: plane at 10m for half the image
    for cam in ("image_00",):
        d = f"{root}/sgm/{seq}/{cam}"
        os.makedirs(d, exist_ok=True)
        for fr in FRAMES:
            dep = np.zeros((H, W), np.float32)
            dep[:, : W // 2] = 10.0
            np.save(f"{d}/{fr:010d}.npy", dep)

    # GT semantics/instances for eval (kitti encoding: sem*1000+inst)
    for fr in FRAMES:
        d1 = f"{root}/data_2d_semantics/train/{seq}/image_00/semantic"
        d2 = f"{root}/data_2d_semantics/train/{seq}/image_00/instance"
        os.makedirs(d1, exist_ok=True)
        os.makedirs(d2, exist_ok=True)
        sem = np.full((H, W), 7, np.uint8)
        sem[5:10, 5:10] = 26
        inst = sem.astype(np.int32) * 1000
        inst[5:10, 5:10] += 1
        Image.fromarray(sem).save(f"{d1}/{fr:010d}.png")
        Image.fromarray(inst.astype(np.uint16)).save(f"{d2}/{fr:010d}.png")
    return seq


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti360"))
    make_fake_kitti(root)
    return root


def test_calibration_parsing(fake_root):
    calib = load_perspective_calib(os.path.join(fake_root, "calibration", "perspective.txt"))
    assert calib["P_rect_00"].shape == (3, 4)
    baseline = -calib["P_rect_01"][0, 3] / calib["P_rect_01"][0, 0]
    assert baseline == pytest.approx(0.6)


def test_poses_and_stereo(fake_root):
    seq = "2013_05_28_drive_0000_sync"
    poses = load_cam0_to_world(os.path.join(fake_root, "data_poses", seq, "cam0_to_world.txt"))
    assert set(poses) == set(FRAMES)
    right = stereo_right_c2w(poses[100], 0.6)
    np.testing.assert_allclose(right[:3, 3], poses[100][:3, 3] + [0.6, 0, 0], atol=1e-9)


def test_xml_parsing_and_affines(fake_root):
    seq = "2013_05_28_drive_0000_sync"
    boxes = parse_bbox_xml(os.path.join(fake_root, "data_3d_bboxes", "train", f"{seq}.xml"))
    assert len(boxes) == 2
    car = boxes[0]
    assert car.label == "car" and car.semantic_id == 26
    assert car.instance_id == 26 * 1000 + 1
    assert car.is_cuboid and not boxes[1].is_cuboid
    # center of the car box (0,0,10) must map to local origin
    A = car.world_to_prim
    local = A[:, :3] @ np.array([0, 0, 10.0]) + A[:, 3]
    np.testing.assert_allclose(local, 0, atol=1e-6)
    # corner (1, .5, 11.5) -> (1,1,1)
    local = A[:, :3] @ np.array([1.0, 0.5, 11.5]) + A[:, 3]
    np.testing.assert_allclose(local, 1, atol=1e-6)
    # polygon: hexagon ring spans [-2,2] in x, [-sqrt(3),sqrt(3)] in z,
    # [-1,1] in y -> the template-AABB corner maps to (+1,+1,+1) local
    B = boxes[1].world_to_prim
    corner = np.array([2.0, 1.0, 2 * np.sin(np.pi / 3)]) + [5, 0, 12]
    local = B[:, :3] @ corner + B[:, 3]
    np.testing.assert_allclose(local, 1, atol=1e-6)
    # hexagonal cross-section -> convex cut planes extracted (6 active)
    assert boxes[1].cut_planes is not None
    active = (np.abs(boxes[1].cut_planes[:, :3]).sum(1) > 0).sum()
    assert active == 6


def test_visibility_window(fake_root):
    seq = "2013_05_28_drive_0000_sync"
    boxes = parse_bbox_xml(os.path.join(fake_root, "data_3d_bboxes", "train", f"{seq}.xml"))
    assert boxes_visible_in_frame(boxes, 100) == [0]
    assert boxes_visible_in_frame(boxes, 101) == [0, 1]


def _cfg(fake_root, **kw):
    cfg = Config()
    cfg.data.dataset = "kitti360"
    cfg.data.root = fake_root
    cfg.data.frame_start = 100
    cfg.data.frame_num = 3
    cfg.data.max_primitives = 4
    cfg.data.max_intervals = 4
    cfg.model.num_classes = 19
    for k, v in kw.items():
        setattr(cfg.data, k, v)
    return cfg


def test_build_dataset_stereo(fake_root):
    cfg = _cfg(fake_root)
    ds = build_kitti360_dataset(cfg)
    assert ds.images.shape == (6, H, W, 3)        # 3 frames x 2 cams
    assert ds.prim_w2p.shape == (6, 4, 3, 4)
    # frame 100 (views 0,1): only car visible; frame 101: both
    assert int(ds.prim_valid[0].sum()) == 1
    assert int(ds.prim_valid[2].sum()) == 2
    # frame 102 uses visible_id -> only car
    assert int(ds.prim_valid[4].sum()) == 1
    # semantic remapped to trainIds: car 26 -> 13
    assert int(ds.prim_sem[0, 0]) == 13
    # pseudo labels remapped: road 7 -> 0
    assert int(ds.pseudo[0, 0, 0]) == 0
    assert int(ds.pseudo[0, 6, 6]) == 13
    # depth present on left cam only; SGM plane-z converted to ray distance
    fx, cx, cy = 20.0, W / 2, H / 2
    x0, y0 = (0.5 - cx) / fx, (0.5 - cy) / fx
    assert float(ds.depth[0, 0, 0]) == pytest.approx(
        10.0 * np.sqrt(x0 * x0 + y0 * y0 + 1.0), rel=1e-5)
    assert float(ds.depth[1, 0, 0]) == 0.0
    # GT loaded and remapped
    assert int(ds.gt_sem[0, 0, 0]) == 0
    assert int(ds.gt_inst[0, 6, 6]) == 1
    # right cam offset by baseline along x
    np.testing.assert_allclose(
        np.asarray(ds.c2w[1, :, 3] - ds.c2w[0, :, 3]), [0.6, 0, 0], atol=1e-6
    )


def test_depth_convention_plane_z_vs_ray(fake_root):
    """SGM depth is plane-z (z along the rectified optical axis); the
    renderer composites ray distance over unit-norm directions. The loader
    must convert: for a fronto-parallel wall at z=10, the ray distance at
    pixel (u, v) is 10 * ||((u-cx)/fx, (v-cy)/fy, 1)|| — exactly 10 only on
    the optical axis, up to ~39% more in a wide-FoV corner. data.depth_
    convention='ray' declares already-converted sources and passes through."""
    from panopticnerf_tpu.data.kitti360 import plane_z_to_ray_factor

    cfg = _cfg(fake_root, use_stereo=False)
    ds = build_kitti360_dataset(cfg)
    dep = np.asarray(ds.depth[0])
    fx = 20.0
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]])
    factor = plane_z_to_ray_factor(K, (H, W))
    # left half of the fixture map is a plane at z=10, right half invalid
    expect = np.where(np.arange(W)[None, :] < W // 2, 10.0 * factor, 0.0)
    np.testing.assert_allclose(dep, expect, rtol=1e-5)
    # factor is >= 1 everywhere, == 1 only at the principal point
    assert factor.min() >= 1.0
    cc = factor[H // 2, W // 2]  # half-pixel off the principal point
    assert cc == pytest.approx(1.0, abs=1e-3)
    assert factor[0, 0] > 1.3  # wide-FoV corner is far from plane-z

    cfg_ray = _cfg(fake_root, use_stereo=False, depth_convention="ray")
    ds_ray = build_kitti360_dataset(cfg_ray)
    dep_ray = np.asarray(ds_ray.depth[0])
    expect_ray = np.broadcast_to(
        np.where(np.arange(W)[None, :] < W // 2, 10.0, 0.0), (H, W))
    np.testing.assert_allclose(dep_ray, expect_ray, rtol=1e-6)

    with pytest.raises(ValueError, match="depth_convention"):
        build_kitti360_dataset(_cfg(fake_root, depth_convention="zz"))


def test_build_dataset_mono_quarter(fake_root):
    cfg = _cfg(fake_root, use_stereo=False, ratio=0.5, use_pspnet=False, use_depth=False)
    ds = build_kitti360_dataset(cfg)
    assert ds.images.shape == (3, H // 2, W // 2, 3)
    assert (np.asarray(ds.pseudo) == 255).all()
    assert (np.asarray(ds.depth) == 0).all()
    # intrinsics scaled
    assert float(ds.K[0, 0, 0]) == pytest.approx(10.0)


def test_build_dataset_fisheye(fake_root):
    import jax.numpy as jnp

    from panopticnerf_tpu.data.kitti360 import fisheye_valid_mask

    cfg = _cfg(fake_root, use_fisheye=True, use_depth=False)
    ds = build_kitti360_dataset(cfg)
    # 3 frames x (2 persp + 1 fisheye) = 9 views
    assert ds.images.shape == (9, H, W, 3)
    assert ds.cam_model is not None
    cm = np.asarray(ds.cam_model)
    assert cm.tolist() == [0, 0, 1] * 3
    # fisheye params rescaled from 40x40 native to (H, W)
    fp = np.asarray(ds.fisheye[2])
    assert fp[0] == pytest.approx(35.0 * W / 40)
    assert fp[2] == pytest.approx(20.0 * W / 40)
    assert fp[4] == pytest.approx(2.2)
    # valid mask: center pixel valid; far corner outside FOV circle
    vm = np.asarray(ds.valid_mask[2])
    assert vm[H // 2, W // 2]
    assert not vm.all()
    # fisheye c2w: cam looks along -x (90deg yaw) with 0.5m offset
    c2w_fe = np.asarray(ds.c2w[2])
    np.testing.assert_allclose(c2w_fe[:, 2], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c2w_fe[:, 3], [0.5, 0, 0], atol=1e-6)


def test_fisheye_batch_rays_unit_and_valid(fake_root):
    import jax
    import jax.numpy as jnp

    from panopticnerf_tpu.data.dataset import sample_ray_batch

    cfg = _cfg(fake_root, use_fisheye=True, use_depth=False)
    ds = build_kitti360_dataset(cfg)
    batch = sample_ray_batch(jax.random.key(0), ds, jnp.asarray([2, 5, 8]), 256)
    assert float(jnp.abs(jnp.linalg.norm(batch.rays_d, axis=-1) - 1).max()) < 1e-4
    # some rays are outside the fisheye FOV circle
    assert bool((~np.asarray(batch.valid)).any())


def test_fisheye_pseudo_labels_and_train_step(fake_root):
    """The -360 branch end-to-end on the fixture tree: fisheye views carry
    their own pspnet pseudo-labels (remapped to trainIds) and the joint
    perspective+fisheye dataset supports a full training step."""
    import jax
    import jax.numpy as jnp

    from panopticnerf_tpu.data.labels import ids_to_trainids
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    cfg = _cfg(fake_root, use_fisheye=True, use_depth=False)
    cfg.data.n_rays = 64
    cfg.render.n_samples = 4
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.compute_dtype = "float32"
    ds = build_kitti360_dataset(cfg)

    # fisheye views (index 2, 5, 8) got the vegetation pseudo-label map,
    # remapped raw id 21 -> trainId
    veg_train = int(ids_to_trainids(np.array([21]))[0])
    assert int(ds.pseudo[2, 0, 0]) == veg_train
    assert int(ds.pseudo[0, 0, 0]) != veg_train  # perspective kept road

    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    state2, stats = step(state, ds, jnp.asarray([2, 5, 8]), jax.random.key(1))
    assert np.isfinite(float(stats["loss_total"]))
    assert int(state2.step) == 1


def test_panorama_rays_cover_sphere():
    import jax.numpy as jnp

    from panopticnerf_tpu.render import panorama_rays

    o, d = panorama_rays(jnp.zeros(3), jnp.eye(3), 16, 32)
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1, atol=1e-6)
    # all octants hit
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                assert ((np.sign(d[:, 0]) == sx) & (np.sign(d[:, 1]) == sy)
                        & (np.sign(d[:, 2]) == sz)).any()
    # center row looks near the horizon (|y| small at phi ~ 0)
    mid = d.reshape(16, 32, 3)[8]
    assert np.abs(mid[:, 1]).max() < 0.2


def test_build_dataset_trains(fake_root):
    """Sanity: the kitti-format dataset plugs into the jitted train step."""
    import jax
    import jax.numpy as jnp

    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    cfg = _cfg(fake_root)
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.use_primitives = True
    cfg.render.far = 30.0
    cfg.data.n_rays = 64
    ds = build_kitti360_dataset(cfg)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    state2, stats = step(state, ds, jnp.arange(6), jax.random.key(1))
    assert np.isfinite(float(stats["loss_total"]))


def test_train_full_bbox_dir_fallback(tmp_path):
    """The raw KITTI-360 download ships data_3d_bboxes/train_full/ — the
    loader accepts it when train/ is absent."""
    import shutil

    from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset

    root = str(tmp_path / "kitti")
    os.makedirs(root)
    seq = make_fake_kitti(root)
    src = os.path.join(root, "data_3d_bboxes", "train")
    dst = os.path.join(root, "data_3d_bboxes", "train_full")
    shutil.move(src, dst)
    cfg = Config()
    cfg.data.dataset = "kitti360"
    cfg.data.root = root
    cfg.data.frame_start = 100
    cfg.data.frame_num = 3
    cfg.data.max_primitives = 4
    cfg.data.max_intervals = 4
    cfg.model.num_classes = 19
    ds = build_kitti360_dataset(cfg)
    assert bool(ds.prim_valid.any())  # primitives were loaded from train_full


def test_max_primitives_truncation_warns(fake_root):
    """Silently dropping visible primitive records (e.g. after concave
    decomposition multiplies them) is never OK — a warning must fire."""
    import warnings as _w

    from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset

    cfg = _cfg(fake_root, max_primitives=1)  # frames 101/102 have 2 records
    with pytest.warns(UserWarning, match="truncated visible primitives"):
        build_kitti360_dataset(cfg)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)  # ample budget -> no warning
        build_kitti360_dataset(_cfg(fake_root, max_primitives=8))


# ------------------------------------------------- loader contract gap tests
# (round-4 VERDICT item 7: real-data quirks — positional visible-id files,
# mm-uint16 SGM PNGs; train_full/ already covered above.)

def test_sgm_uint16_png_is_millimeters(tmp_path):
    """KITTI-360-style uint16 depth PNGs store millimeters; float arrays
    (npy) are meters. Both must come back as meters."""
    from PIL import Image

    from panopticnerf_tpu.data.kitti360 import _load_depth

    base = str(tmp_path / "0000000100")
    mm = np.zeros((6, 8), np.uint16)
    mm[2, 3] = 5250          # 5.25 m
    Image.fromarray(mm).save(base + ".png")
    d = _load_depth(base, (6, 8))
    assert d.dtype == np.float32
    assert d[2, 3] == pytest.approx(5.25)
    assert d.sum() == pytest.approx(5.25)     # zeros stay invalid

    base2 = str(tmp_path / "0000000101")
    np.save(base2 + ".npy", np.full((6, 8), 7.5, np.float32))
    assert _load_depth(base2, (6, 8))[0, 0] == pytest.approx(7.5)


def test_visible_id_positional_when_xml_has_no_index(tmp_path):
    """Older 3D-bbox exports carry no <index> node: visible-id entries are
    then POSITIONAL (the annotation's ordinal in the file), and one ordinal
    resolves to every convex piece of that annotation."""
    import xml.etree.ElementTree as ET

    root = str(tmp_path / "kitti")
    seq = make_fake_kitti(root)
    xml_path = f"{root}/data_3d_bboxes/train/{seq}.xml"
    tree = ET.parse(xml_path)
    for obj in tree.getroot():
        idx = obj.find("index")
        if idx is not None:
            obj.remove(idx)
    tree.write(xml_path)

    boxes = parse_bbox_xml(xml_path)
    assert all(b.index == -1 for b in boxes)
    assert [b.ordinal for b in boxes] == list(range(len(boxes)))

    # visible_id "0" at frame 102 must now resolve positionally to the car
    # (ordinal 0), reproducing the index-node fixture's expectation.
    cfg = _cfg(root)
    ds = build_kitti360_dataset(cfg)
    assert int(ds.prim_valid[4].sum()) == 1
    assert int(ds.prim_sem[4, 0]) == 13        # car trainId


def test_visible_id_ordinal_expands_concave_pieces(tmp_path):
    """A concave extrusion is stored as ONE annotation but parses into
    several convex Bbox3D records; a positional visible-id entry must keep
    every piece (dropping one would punch holes in the fixed field)."""
    import xml.etree.ElementTree as ET

    from panopticnerf_tpu.data.annotation3d import load_visible_ids

    # single L-shaped building, no <index> node
    rootel = ET.Element("opencv_storage")
    obj = ET.SubElement(rootel, "object_0")
    T = np.eye(4)
    T[:3, 3] = [0, 0, 10]
    _mat_xml(obj, "transform", T)
    l2d = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 3], [0, 3]], float)
    poly = np.concatenate([
        np.stack([l2d[:, 0], np.full(6, -1.0), l2d[:, 1]], 1),
        np.stack([l2d[:, 0], np.full(6, 1.0), l2d[:, 1]], 1),
    ])
    _mat_xml(obj, "vertices", poly)
    _mat_xml(obj, "faces", np.zeros((8, 4)))
    ET.SubElement(obj, "label").text = "building"
    ET.SubElement(obj, "semanticId").text = "11"
    ET.SubElement(obj, "instanceId").text = "7"
    ET.SubElement(obj, "start_frame").text = "0"
    ET.SubElement(obj, "end_frame").text = "10"
    ET.SubElement(obj, "timestamp").text = "-1"
    ET.SubElement(obj, "dynamic").text = "0"
    xml_path = str(tmp_path / "seq.xml")
    ET.ElementTree(rootel).write(xml_path)

    boxes = parse_bbox_xml(xml_path)
    assert len(boxes) >= 2                      # L -> >= 2 convex pieces
    assert all(b.ordinal == 0 for b in boxes)   # ...sharing the annotation
    assert all(b.instance_id == boxes[0].instance_id for b in boxes)

    # .npy visible-id variant while we're here
    vd = str(tmp_path)
    np.save(os.path.join(vd, "0000000005.npy"), np.array([0]))
    vis = load_visible_ids(vd, 5)
    assert vis.tolist() == [0]
    ordinal_of = {}
    for i, b in enumerate(boxes):
        ordinal_of.setdefault(b.ordinal, []).append(i)
    resolved = [i for v in vis.tolist() for i in ordinal_of.get(v, [])]
    assert resolved == list(range(len(boxes)))


def test_pseudo_cross_view_loader_smoke(fake_root):
    """data.pseudo_cross_view engages at load time without disturbing the
    fixture's consistent labels (agreeing votes never demote wholesale).
    In pull mode the no-depth stereo-right views pass through untouched;
    in splat mode (default) they are cleaned too — that coverage is the
    mode's reason to exist."""
    base = build_kitti360_dataset(_cfg(fake_root))
    import numpy as np

    a = np.asarray(base.pseudo)
    ds_pull = build_kitti360_dataset(
        _cfg(fake_root, pseudo_cross_view=2, pseudo_xview_mode="pull"))
    b = np.asarray(ds_pull.pseudo)
    assert a.shape == b.shape
    # pull: right-cam views (odd indices, no SGM stream) -> bit-identical
    assert (a[1::2] == b[1::2]).all()
    assert (a != b).mean() < 0.05

    ds_splat = build_kitti360_dataset(_cfg(fake_root, pseudo_cross_view=2))
    c = np.asarray(ds_splat.pseudo)
    # the fixture's pseudo labels are multi-view consistent: demotions may
    # only come from reprojection rounding at boundaries, never wholesale
    assert (a != c).mean() < 0.05, (a != c).mean()
    # splat only ever demotes (repaint off) — never authors new labels
    assert ((c == a) | (c == 255)).all()

def test_scene_normalization_independent_of_streams(fake_root):
    """Round-5 dress-rehearsal catch: the scene frame (bounds_center/scale)
    must be a property of the sequence window, NOT of which camera streams
    are enabled — a stereo-trained checkpoint evaluated with
    `use_stereo False` rendered ~16 dB garbage when the normalization
    averaged over the loaded view pool. cam0-only derivation pins it."""
    base = build_kitti360_dataset(_cfg(fake_root, use_stereo=False))
    stereo = build_kitti360_dataset(_cfg(fake_root))
    np.testing.assert_array_equal(np.asarray(base.bounds_center),
                                  np.asarray(stereo.bounds_center))
    np.testing.assert_array_equal(np.asarray(base.bounds_scale),
                                  np.asarray(stereo.bounds_scale))
    fe = build_kitti360_dataset(_cfg(fake_root, use_fisheye=True,
                                     use_depth=False))
    np.testing.assert_array_equal(np.asarray(base.bounds_center),
                                  np.asarray(fe.bounds_center))
    np.testing.assert_array_equal(np.asarray(base.bounds_scale),
                                  np.asarray(fe.bounds_scale))
