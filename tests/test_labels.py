import numpy as np

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
