"""Device mesh + sharding rules (replaces the reference's unused DDP path).

SURVEY.md §2.4: the reference's only parallelism is (optional, unused)
torch DDP gradient all-reduce over ray batches. TPU-native equivalent:
a 1-D `data` mesh; parameters/optimizer state replicated, the ray batch
sharded along the mesh; XLA GSPMD inserts the gradient psum over ICI.

No TP/PP — a ~1M-param NeRF MLP never needs it; rays are embarrassingly
parallel (SURVEY.md §2.4 point 3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panopticnerf_tpu.config import Config


def make_mesh(cfg: Config, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.parallel.data_parallel or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), axis_names=(cfg.parallel.mesh_axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
