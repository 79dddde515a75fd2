import numpy as np
import pytest

from panopticnerf_tpu.data import labels as L


def test_table_shape():
    assert len(L.LABELS) == L.NUM_IDS == 45
    ids = [l.id for l in L.LABELS]
    assert ids == list(range(45))


def test_trainid_mapping():
    assert L.ID_TO_TRAINID[7] == 0           # road
    assert L.ID_TO_TRAINID[23] == 10         # sky
    assert L.ID_TO_TRAINID[26] == 13         # car
    assert L.ID_TO_TRAINID[0] == 255         # unlabeled -> ignore
    used = set(int(t) for t in L.ID_TO_TRAINID if t != 255)
    assert used == set(range(19))


def test_things_flags():
    assert bool(L.TRAINID_HAS_INSTANCES[13])      # car is a thing
    assert not bool(L.TRAINID_HAS_INSTANCES[0])   # road is stuff
    assert bool(L.TRAINID_HAS_INSTANCES[2])       # building is a thing in KITTI-360


def test_colorize_roundtrip():
    sem = np.array([[7, 23], [26, 0]])
    train = L.ids_to_trainids(sem)
    assert train.tolist() == [[0, 10], [13, 255]]
    rgb = L.colorize_trainids(train)
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 0].tolist() == [128, 64, 128]   # road
    assert rgb[1, 1].tolist() == [0, 0, 0]        # ignore -> black


def test_out_of_range_ids_ignored():
    out = L.ids_to_trainids(np.array([-1, 99, 7]))
    assert out.tolist() == [255, 255, 0]


def test_majority_clean_removes_speckle_keeps_regions():
    """data/pseudo.majority_clean: isolated flips -> ignore; contiguous
    regions and their boundaries survive; ignore never becomes a label."""
    from panopticnerf_tpu.data.pseudo import majority_clean

    lab = np.zeros((8, 10), np.int32)
    lab[:, 5:] = 1          # two half-planes, straight boundary
    lab[2, 2] = 7           # isolated speckle inside class 0
    lab[5, 7] = 3           # isolated speckle inside class 1
    lab[0, 0] = 255         # pre-ignored pixel
    out = majority_clean(lab, k=2)
    assert out[2, 2] == 255 and out[5, 7] == 255
    assert out[0, 0] == 255
    # boundary pixels keep their labels (>= 2 same-label neighbors each)
    assert (out[:, 4] == 0).all() and (out[:, 5] == 1).all()
    # interior untouched
    assert (out[4, 1:4] == 0).all()
    # k=0 is a no-op
    assert (majority_clean(lab, 0) == lab).all()


def test_majority_clean_noise_rate_drops():
    """Statistical check mirroring the synthetic fixture's noise model:
    uniform 7% flips over large class regions are mostly removed while
    clean pixels are mostly retained."""
    from panopticnerf_tpu.data.pseudo import majority_clean

    rng = np.random.default_rng(0)
    gt = np.zeros((64, 96), np.int32)
    gt[:, 48:] = 2
    noisy = gt.copy()
    flip = rng.uniform(size=gt.shape) < 0.07
    noisy[flip] = rng.integers(0, 5, size=int(flip.sum()))
    out = majority_clean(noisy, k=2)
    changed = noisy != gt
    wrong_kept = ((out == noisy) & changed & (out != 255)).sum() / max(changed.sum(), 1)
    clean_kept = ((out == gt) & ~changed).sum() / (~changed).sum()
    assert wrong_kept < 0.1     # >90% of noise removed
    assert clean_kept > 0.97    # <3% of clean labels sacrificed


# ---------------------------------------------------------- cross-view clean
def _pinhole_setup(n_views, H=16, W=20, f=20.0, plane_z=5.0, baselines=None):
    """n_views pinhole cameras looking down +z at a fronto-parallel plane
    z=plane_z, translated along x by `baselines`. Returns (labels, depths,
    Ks, c2ws, frames, persp) with analytically exact RAY-distance depth."""
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    dirs = np.stack([(us - K[0, 2]) / f, (vs - K[1, 2]) / f,
                     np.ones_like(us)], -1)
    ray_depth = plane_z * np.linalg.norm(dirs, axis=-1)   # plane-z -> ray
    baselines = baselines if baselines is not None else [0.0] * n_views
    labels = np.zeros((n_views, H, W), np.int32)
    depths = np.tile(ray_depth[None].astype(np.float32), (n_views, 1, 1))
    Ks = np.tile(K[None], (n_views, 1, 1))
    c2ws = np.zeros((n_views, 3, 4), np.float32)
    for i, b in enumerate(baselines):
        c2ws[i, :, :3] = np.eye(3)
        c2ws[i, 0, 3] = b
    frames = np.zeros(n_views, np.int64)
    persp = np.ones(n_views, bool)
    return labels, depths, Ks, c2ws, frames, persp


def test_cross_view_clean_demotes_losing_blob_keeps_agreement():
    """PULL mode: a coherent wrong-label blob in one view is contradicted
    by two identically-posed clean views and demoted; agreeing pixels,
    ignored pixels, and depthless pixels are untouched."""
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(3)
    labels[0, 4:8, 6:12] = 7       # blob: view 0 says 7, views 1/2 say 0
    labels[0, 0, 0] = 255          # pre-ignored stays ignored (not voted on)
    depths[0, 1, 1] = 0.0          # no depth -> pull cannot clean it
    labels[0, 1, 1] = 9
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=0, mode="pull")
    assert (out[0, 4:8, 6:12] == 255).all()
    assert out[0, 0, 0] == 255 and out[0, 1, 1] == 9
    # everything outside the blob agrees and survives
    keep = np.ones((16, 20), bool)
    keep[4:8, 6:12] = False
    keep[0, 0] = keep[1, 1] = False
    assert (out[0][keep] == 0).all()
    # the clean views lose nothing (their 1-vs-1 votes split 1 agree /
    # 1 disagree inside the blob footprint -> no strict majority)
    assert (out[1] != 255).all() and (out[2] != 255).all()


def test_cross_view_clean_splat_cleans_depthless_pixels_and_views():
    """SPLAT mode's reason to exist: pixels (and whole views) WITHOUT a
    depth stream are still cleaned, because votes are pushed from the
    depth-carrying views' splats instead of pulled through own depth.
    Mirrors the KITTI-360 layout where only image_00 has SGM."""
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(4)
    depths[3] = 0.0                # view 3: no depth stream at all
    labels[3, 4:8, 6:12] = 7       # blob in the depthless view
    depths[0, 1, 1] = 0.0          # depth hole inside a depth view
    labels[0, 1, 1] = 9
    labels[3, 0, 0] = 255          # ignore is never voted back to a label
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=0, mode="splat")
    assert (out[3, 4:8, 6:12] == 255).all()    # depthless view cleaned
    assert out[0, 1, 1] == 255                 # depth-hole pixel cleaned
    assert out[3, 0, 0] == 255
    # depthless view contributed no votes: depth views keep their labels
    assert (out[1] == 0).all() and (out[2] == 0).all()


def test_cross_view_clean_occlusion_blocks_vote():
    """PULL mode: a voter whose depth disagrees with the projected distance
    (occluded surface) must not vote: the blob survives when the only
    would-be voters fail depth verification."""
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(3)
    labels[0, 4:8, 6:12] = 7
    depths[1] *= 0.5               # voters see a much nearer surface
    depths[2] *= 0.5
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=0, mode="pull")
    assert (out[0, 4:8, 6:12] == 7).all()


def test_cross_view_clean_splat_zbuffer_occlusion():
    """SPLAT mode: a far splat hidden behind a nearer splat at the same
    target pixel must not vote (z-buffer visibility test)."""
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(4)
    labels[0, 4:8, 6:12] = 7       # target blob
    # views 1+2: NEAR surface with the blob's label (the visible voters)
    depths[1] *= 0.5
    labels[1] = 7
    depths[2] *= 0.5
    labels[2] = 7
    # view 3: far surface (z=plane) labeled 0 — occluded by the near splats
    labels[3] = 0
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=0, mode="splat")
    # visible voters agree with the blob; the far disagreeing splat is
    # z-buffered out -> blob survives
    assert (out[0, 4:8, 6:12] == 7).all()


def test_cross_view_clean_splat_repaint():
    """repaint > 0: a losing label is REPLACED by the voters' class when
    they concentrate enough; demoted to ignore otherwise."""
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(4)
    labels[0, 4:8, 6:12] = 7       # unanimous voters say 0 -> repaint to 0
    labels[0, 10, 3] = 5           # split voters (0, 0, 9): majority 0 at
    labels[1, 10, 3] = 9           # 2/3 < 0.8 -> demote to ignore
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=0, mode="splat", repaint=0.8)
    assert (out[0, 4:8, 6:12] == 0).all()
    assert out[0, 10, 3] == 255


@pytest.mark.parametrize("mode", ["pull", "splat"])
def test_cross_view_clean_frame_window_and_fisheye_excluded(mode):
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(3)
    labels[0, 4:8, 6:12] = 7
    frames[:] = [0, 5, 6]          # both voters outside window=2
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=2, mode=mode)
    assert (out[0, 4:8, 6:12] == 7).all()
    frames[:] = [0, 1, 2]          # voters in window, but one is fisheye
    persp[2] = False
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=2, mode=mode)
    # single remaining voter < min_voters=2 -> still no demotion
    assert (out[0, 4:8, 6:12] == 7).all()
    persp[2] = True
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=2, mode=mode)
    assert (out[0, 4:8, 6:12] == 255).all()


@pytest.mark.parametrize("mode", ["pull", "splat"])
def test_cross_view_clean_translated_camera_geometry(mode):
    """Real parallax: a stereo pair translated along x. The projection must
    land at the disparity-shifted pixel — verified by demoting exactly the
    source pixels whose reprojection stays in the voter's image."""
    from panopticnerf_tpu.data.pseudo import cross_view_clean

    f, plane_z, b = 20.0, 5.0, 2.0
    labels, depths, Ks, c2ws, frames, persp = _pinhole_setup(
        2, f=f, plane_z=plane_z, baselines=[0.0, b])
    labels[0] = 3                  # every vote disagrees
    labels[1] = 4
    out = cross_view_clean(labels, depths, Ks, c2ws, frames, persp,
                           window=0, min_voters=1, mode=mode)
    # view 1 sits at x=+b: a world point at pixel u projects to
    # u' = u - f*b/z; votes exist only where u' >= 0.
    disparity = f * b / plane_z    # = 8 px
    u_min = int(np.ceil(disparity))
    assert (out[0][:, u_min:] == 255).all()
    assert (out[0][:, : u_min - 1] == 3).all()
