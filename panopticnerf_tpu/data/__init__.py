from panopticnerf_tpu.data.dataset import (
    DeviceDataset,
    RayBatch,
    batch_intervals,
    sample_ray_batch,
    train_test_split,
    view_primitives,
    view_rays,
)


def make_dataset(cfg):
    """Factory mirroring the reference's make_dataset ([pn]
    lib/datasets/make_dataset.py): returns (DeviceDataset, train_ids, test_ids)."""
    import numpy as np

    if cfg.data.dataset == "synthetic":
        from panopticnerf_tpu.data.synthetic import build_synthetic_dataset

        ds = build_synthetic_dataset(cfg, seed=cfg.train.seed)
    elif cfg.data.dataset == "kitti360":
        from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset

        ds = build_kitti360_dataset(cfg)
    else:
        raise ValueError(f"unknown dataset {cfg.data.dataset!r}")
    train_ids, test_ids = train_test_split(ds.images.shape[0], cfg.data.test_every)
    if len(test_ids) == 0:
        test_ids = train_ids[:1]
    return ds, np.asarray(train_ids), np.asarray(test_ids)


__all__ = [
    "DeviceDataset",
    "RayBatch",
    "batch_intervals",
    "make_dataset",
    "sample_ray_batch",
    "train_test_split",
    "view_primitives",
    "view_rays",
]
