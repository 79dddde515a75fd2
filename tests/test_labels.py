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
