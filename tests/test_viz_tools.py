"""Visualizer + tools coverage."""

import os
import subprocess
import sys

import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.viz import Visualizer, depth_to_color

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _viz(tmp_path, num_classes=19, dataset="kitti360"):
    cfg = Config()
    cfg.result_dir = str(tmp_path)
    cfg.data.dataset = dataset
    cfg.model.num_classes = num_classes
    return cfg, Visualizer(cfg)


def test_kitti_palette_colorize(tmp_path):
    cfg, viz = _viz(tmp_path)
    sem = np.array([[0, 10, 13]])  # road, sky, car trainIds
    rgb = viz.colorize_sem(sem)
    assert rgb[0, 0].tolist() == [128, 64, 128]
    assert rgb[0, 1].tolist() == [70, 130, 180]
    assert rgb[0, 2].tolist() == [0, 0, 142]


def test_panoptic_tint_distinguishes_instances(tmp_path):
    cfg, viz = _viz(tmp_path)
    sem = np.full((2, 2), 13)          # car
    inst = np.array([[1, 1], [2, 2]])
    out = viz.colorize_panoptic(sem, inst)
    assert not np.array_equal(out[0, 0], out[1, 0])  # instances differ
    assert np.array_equal(out[0, 0], out[0, 1])      # same instance same tint


def test_depth_colormap_monotone_channels():
    d = np.linspace(1, 50, 16).reshape(4, 4)
    c = depth_to_color(d)
    assert c.shape == (4, 4, 3)
    flat_r = c[..., 0].reshape(-1)
    assert flat_r[-1] >= flat_r[0]  # red rises with depth


def test_label_transfer_encoding(tmp_path):
    from PIL import Image

    cfg, viz = _viz(tmp_path)
    sem = np.full((4, 6), 13)  # car trainId -> raw id 26
    inst = np.full((4, 6), 7)
    files = viz.write_label_transfer(3, sem, inst, (4, 6))
    enc = np.asarray(Image.open([f for f in files if "labelinst" in f][0]))
    assert (enc == 26 * 1000 + 7).all()
    raw = np.asarray(Image.open([f for f in files if "labelsem" in f][0]))
    assert (raw == 26).all()


def test_compute_visible_ids_tool(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_kitti360 import make_fake_kitti

    root = str(tmp_path / "kitti")
    os.makedirs(root)
    seq = make_fake_kitti(root)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compute_visible_ids.py"),
         "--root", root, "--sequence", seq, "--max-depth", "50"],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0, out.stderr
    # frame 100: the car (index 0, at z=10 in front of camera) is visible;
    # the building (index 1) is out of its annotation window at frame 100
    ids = open(os.path.join(root, "visible_id", seq, "0000000100.txt")).read().split()
    assert "0" in ids and "1" not in ids
    # frame 101: building window opens
    ids = open(os.path.join(root, "visible_id", seq, "0000000101.txt")).read().split()
    assert "0" in ids and "1" in ids


def test_check_data_tool(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from test_kitti360 import make_fake_kitti
    import check_data

    root = str(tmp_path / "kitti")
    os.makedirs(root)
    seq = make_fake_kitti(root)

    rep = check_data.check_tree(root, seq, [100, 101, 102])
    assert rep["images/image_00"][0] == "ok"
    assert rep["primitives/3d_bboxes"][0] == "ok"
    assert rep["primitives/visible_id"][0] == "partial"  # only frame 102
    assert rep["primitives/visible_id"][1] is False      # ...and optional
    assert all(st == "ok" for st, req, _ in rep.values() if req)

    # fisheye flags: image_02 present, image_03 absent-but-optional
    rep = check_data.check_tree(root, seq, [100, 101, 102], use_fisheye=True)
    assert rep["images/image_02"][0] == "ok"
    assert rep["images/image_03"][0] == "missing" and not rep["images/image_03"][1]

    # a hole in a required stream flips it to partial
    os.remove(os.path.join(root, "data_2d_raw", seq, "image_00", "data_rect",
                           "0000000101.png"))
    rep = check_data.check_tree(root, seq, [100, 101, 102])
    assert rep["images/image_00"][0] == "partial"

    # CLI: fails on the broken tree, exit 0 after restricting the window
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_data.py"),
         "--root", root, "--sequence", seq,
         "--frame_start", "100", "--frame_num", "3"],
        capture_output=True, text=True)
    assert out.returncode == 1 and "FAIL" in out.stdout
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_data.py"),
         "--root", root, "--sequence", seq,
         "--frame_start", "102", "--frame_num", "1"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout

    # KEY VALUE overrides apply even WITHOUT --cfg_file (they were once
    # silently dropped, checking the default datasets/KITTI-360 instead)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_data.py"),
         "data.root", root, "data.sequence", seq,
         "data.frame_start", "102", "data.frame_num", "1"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert root in out.stdout and "OK" in out.stdout


def test_export_label_transfer_roundtrip(tmp_path):
    """tools/export_label_transfer.py writes the data_2d_semantics layout
    the loader itself consumes: export from a (briefly) trained checkpoint,
    point the tree's GT at the export, and the loader must read back the
    exact predicted maps (raw ids -> trainIds; instance = enc % 1000)."""
    import shutil

    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.data import labels as L
    from panopticnerf_tpu.data.demo_tree import write_demo_tree
    from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset
    from panopticnerf_tpu.engine import run_train

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import export_label_transfer as elt

    root = str(tmp_path / "tree")
    os.makedirs(root)
    seq = write_demo_tree(root, n_frames=2, hw=(24, 32), n_boxes=3, seed=0,
                          label_noise=0.0, depth_keep=1.0)
    cfg = Config()
    cfg.model_dir = str(tmp_path / "m")
    cfg.record_dir = str(tmp_path / "r")
    cfg.result_dir = str(tmp_path / "res")
    cfg.data.dataset = "kitti360"
    cfg.data.root = root
    cfg.data.frame_num = 2
    cfg.data.test_every = 2
    cfg.data.max_primitives = 8
    cfg.data.max_intervals = 4
    cfg.data.n_rays = 64
    cfg.data.views_per_batch = 1
    cfg.model.num_classes = 19
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.n_importance = 0
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    cfg.render.ray_tile = 128
    cfg.train.ep_iter = 2
    cfg.train.epochs = 1
    cfg.train.save_ep = 1
    cfg.train.eval_ep = 1
    cfg.train.save_best = False
    cfg.train.pretrain = ""
    run_train(cfg)

    out = str(tmp_path / "export")
    files = elt.export(cfg, out)
    assert len(files) == 4  # 2 frames x (semantic, instance)
    assert files[0].endswith(os.path.join(
        "train", seq, "image_00", "semantic", "0000000000.png"))

    # Round-trip: replace the tree's GT with the export; the loader must
    # read back exactly what was written.
    from PIL import Image

    sem_png = np.asarray(Image.open(files[0])).astype(np.int32)
    enc_png = np.asarray(Image.open(files[1])).astype(np.int32)
    np.testing.assert_array_equal(enc_png // 1000, sem_png)

    dst = os.path.join(root, "data_2d_semantics")
    shutil.rmtree(dst)
    shutil.copytree(os.path.join(out, "train"), os.path.join(dst, "train"))
    ds = build_kitti360_dataset(cfg)
    want_sem = L.ID_TO_TRAINID[np.clip(sem_png, 0, L.NUM_IDS - 1)]
    np.testing.assert_array_equal(np.asarray(ds.gt_sem[0]), want_sem)
    np.testing.assert_array_equal(np.asarray(ds.gt_inst[0]), enc_png % 1000)

    # CLI surface: KEY VALUE overrides + --zip
    out2 = str(tmp_path / "export_cli")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_label_transfer.py"),
         "--out", out2, "--zip",
         "data.dataset", "kitti360", "data.root", root,
         "data.frame_num", "2", "data.test_every", "2",
         "data.max_primitives", "8", "data.max_intervals", "4",
         "model.num_classes", "19", "model.trunk_depth", "2",
         "model.trunk_width", "16", "model.color_width", "8",
         "model.compute_dtype", "float32", "render.n_samples", "8",
         "render.n_importance", "0", "render.near", "0.5",
         "render.far", "40.0", "render.ray_tile", "128",
         "model_dir", cfg.model_dir],
        capture_output=True, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out2 + ".zip")


def test_check_data_depth_units(tmp_path):
    """Deliberately corrupted depth units (mm-as-m, m-as-uint16) are flagged
    by the value check; the healthy fixture tree passes it."""
    import numpy as np
    from PIL import Image

    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from test_kitti360 import make_fake_kitti
    import check_data

    root = str(tmp_path / "kitti")
    os.makedirs(root)
    seq = make_fake_kitti(root)
    frames = [100, 101, 102]

    stat, msg = check_data.diagnose_depth_units(root, seq, frames)
    assert stat == "ok" and "10.0 m" in msg

    sgm = os.path.join(root, "sgm", seq, "image_00")
    # corrupt 1: float map in MILLIMETERS (10 m plane -> 10000)
    dep = np.zeros((24, 32), np.float32)
    dep[:, :16] = 10000.0
    for fr in frames:
        np.save(os.path.join(sgm, f"{fr:010d}.npy"), dep)
    stat, msg = check_data.diagnose_depth_units(root, seq, frames)
    assert stat == "warn" and "MILLIMETERS" in msg

    # corrupt 2: uint16 png storing METERS (loader /1000 rule -> 0.01 m)
    for fr in frames:
        os.remove(os.path.join(sgm, f"{fr:010d}.npy"))
        arr = np.zeros((24, 32), np.uint16)
        arr[:, :16] = 10
        Image.fromarray(arr).save(os.path.join(sgm, f"{fr:010d}.png"))
    stat, msg = check_data.diagnose_depth_units(root, seq, frames)
    assert stat == "warn" and "small" in msg

    # the CLI surfaces the warning and fails
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_data.py"),
         "--root", root, "--sequence", seq,
         "--frame_start", "100", "--frame_num", "3"],
        capture_output=True, text=True)
    assert out.returncode == 1 and "depth/units" in out.stdout

    # one unrepresentative frame (sparse far-range points) must not flip
    # the verdict: the heuristic aggregates the median over ALL frames
    for fr in frames:
        os.remove(os.path.join(sgm, f"{fr:010d}.png"))
    noisy = np.zeros((24, 32), np.float32)
    noisy[0, :4] = 500.0  # a handful of >200 m outlier points
    np.save(os.path.join(sgm, f"{frames[0]:010d}.npy"), noisy)
    good = np.zeros((24, 32), np.float32)
    good[:, :16] = 10.0
    for fr in frames[1:]:
        np.save(os.path.join(sgm, f"{fr:010d}.npy"), good)
    stat, msg = check_data.diagnose_depth_units(root, seq, frames)
    assert stat == "ok" and "3 frames" in msg


def test_corrupt_pseudo_structured_noise(tmp_path):
    """tools/corrupt_pseudo.py: clones a tree with symlinks, repaints ~frac
    of valid pseudo pixels in coherent blobs with confusable classes, and
    leaves GT/zero pixels untouched."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import corrupt_pseudo

    rng = np.random.default_rng(0)
    sem = np.full((64, 128), 11, np.int32)      # building
    sem[:16] = 23                               # sky band
    sem[:, :8] = 0                              # invalid margin
    out, got = corrupt_pseudo.corrupt_map(sem, 0.2, rng)
    assert out.shape == sem.shape
    assert 0.1 < got < 0.4                      # near target, blob-quantized
    assert np.all(out[sem == 0] == 0)           # invalid pixels untouched
    changed = out != sem
    assert changed.mean() > 0.05
    # coherence: changed pixels form blobs, not salt-and-pepper — most
    # changed pixels have a changed 4-neighbor
    nb = np.zeros_like(changed)
    nb[1:] |= changed[:-1]
    nb[:-1] |= changed[1:]
    nb[:, 1:] |= changed[:, :-1]
    nb[:, :-1] |= changed[:, 1:]
    assert (changed & nb).sum() / changed.sum() > 0.95

    # CLI: clone a mini tree
    src = tmp_path / "src"
    (src / "pspnet" / "seq" / "image_00").mkdir(parents=True)
    (src / "data_2d_semantics").mkdir()
    np.save(src / "pspnet" / "seq" / "image_00" / "0000000000.npy", sem)
    dst = tmp_path / "dst"
    out2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "corrupt_pseudo.py"),
         "--src", str(src), "--dst", str(dst), "--frac", "0.15"],
        capture_output=True, text=True)
    assert out2.returncode == 0, out2.stderr
    assert (dst / "data_2d_semantics").is_symlink()
    noisy = np.load(dst / "pspnet" / "seq" / "image_00" / "0000000000.npy")
    assert (noisy != sem).mean() > 0.05
