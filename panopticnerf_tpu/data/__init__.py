from panopticnerf_tpu.data.dataset import (
    DeviceDataset,
    concat_datasets,
    RayBatch,
    batch_intervals,
    sample_ray_batch,
    train_test_split,
    view_primitives,
    view_rays,
)


def make_dataset(cfg):
    """Factory mirroring the reference's make_dataset ([pn]
    lib/datasets/make_dataset.py): returns (DeviceDataset, train_ids, test_ids).

    When streaming is enabled (data.stream_window > 0) the dataset is built
    HOST-resident (CPU backend): only the rotating window — uploaded by
    ViewWindowStreamer — plus eval views transferred on demand ever occupy
    HBM, so streaming actually reduces peak device memory.
    """
    import contextlib

    import jax

    build_ctx = contextlib.nullcontext()
    if cfg.data.stream_window > 0:
        build_ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    with build_ctx:
        return _make_dataset(cfg)


def _make_dataset(cfg):
    import numpy as np

    if cfg.data.dataset == "synthetic":
        from panopticnerf_tpu.data.synthetic import build_synthetic_dataset

        ds = build_synthetic_dataset(cfg, seed=cfg.train.seed)
    elif cfg.data.dataset == "kitti360":
        import dataclasses

        from panopticnerf_tpu.data.dataset import concat_datasets
        from panopticnerf_tpu.data.kitti360 import build_kitti360_dataset

        seqs = list(cfg.data.sequences) or [cfg.data.sequence]
        parts = []
        for sq in seqs:
            c = dataclasses.replace(cfg)  # shallow; only data.sequence differs
            c = dataclasses.replace(c, data=dataclasses.replace(cfg.data, sequence=sq))
            parts.append(build_kitti360_dataset(c))
        ds = concat_datasets(parts)
    else:
        raise ValueError(f"unknown dataset {cfg.data.dataset!r}")
    train_ids, test_ids = train_test_split(ds.images.shape[0], cfg.data.test_every)
    if len(test_ids) == 0:
        test_ids = train_ids[:1]
    return ds, np.asarray(train_ids), np.asarray(test_ids)


__all__ = [
    "DeviceDataset",
    "concat_datasets",
    "RayBatch",
    "batch_intervals",
    "make_dataset",
    "sample_ray_batch",
    "train_test_split",
    "view_primitives",
    "view_rays",
]
