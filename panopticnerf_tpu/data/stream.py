"""Host-side streaming of view windows into device memory.

SURVEY.md §2.4(2)/§5.7: large multi-sequence runs cannot keep every view in
HBM. The reference streams per-ray batches from DataLoader workers; the TPU
design instead keeps the *train step* fully on-device and streams at a much
coarser granularity: a window of W whole views is resident in HBM, and a
background host thread prepares + uploads the next window (double-buffered
`jax.device_put`) while the current one trains. The jitted step is unchanged
— it just receives a different DeviceDataset pytree (same shapes, so no
recompile) every `refresh_steps`.
"""

from __future__ import annotations

from typing import Optional

import threading

import jax
import numpy as np

from panopticnerf_tpu.data.dataset import DeviceDataset


class HostViews:
    """Numpy mirror of a DeviceDataset (all views on host)."""

    def __init__(self, arrays: dict):
        self.arrays = arrays  # field name -> np.ndarray or None
        self.num_views = arrays["images"].shape[0]

    @classmethod
    def from_device(cls, ds: DeviceDataset) -> "HostViews":
        return cls({k: (None if v is None else np.asarray(v)) for k, v in ds._asdict().items()})

    def window(self, view_ids: np.ndarray) -> DeviceDataset:
        """Materialize a device dataset holding only `view_ids` (host slice)."""
        per_view = {
            "images", "K", "c2w", "pseudo", "depth", "prim_w2p", "prim_sem",
            "prim_inst", "prim_valid", "prim_planes", "gt_sem", "gt_inst", "cam_model",
            "fisheye", "valid_mask",
        }
        out = {}
        for k, v in self.arrays.items():
            if v is None:
                out[k] = None
            elif k in per_view:
                out[k] = v[view_ids]
            else:
                out[k] = v
        return DeviceDataset(**jax.device_put(out))


class ViewWindowStreamer:
    """Double-buffered window rotation.

    current() returns the resident DeviceDataset; advance() kicks off the
    async upload of the next window and returns the freshly-ready one when
    available. Window membership is drawn by a seeded RNG so runs are
    reproducible.
    """

    def __init__(self, host: HostViews, window_size: int, seed: int = 0,
                 include: Optional[np.ndarray] = None):
        self.host = host
        self.pool = np.asarray(include) if include is not None else np.arange(host.num_views)
        self.window_size = min(window_size, len(self.pool))
        self.rng = np.random.default_rng(seed)
        self._lock = threading.Lock()
        self._next: Optional[tuple[DeviceDataset, np.ndarray]] = None
        self._thread: Optional[threading.Thread] = None
        self.refreshes = 0  # completed advance() swaps (run-record evidence)
        ids = self._draw()
        self._current = (self.host.window(ids), ids)
        self._start_prefetch()

    def _draw(self) -> np.ndarray:
        return np.sort(self.rng.choice(self.pool, self.window_size, replace=False))

    def _start_prefetch(self):
        ids = self._draw()

        def work():
            ds = self.host.window(ids)
            with self._lock:
                self._next = (ds, ids)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def current(self) -> tuple[DeviceDataset, np.ndarray]:
        return self._current

    def advance(self) -> tuple[DeviceDataset, np.ndarray]:
        """Swap to the prefetched window (blocking only if upload lags)."""
        if self._thread is not None:
            self._thread.join()
        with self._lock:
            assert self._next is not None
            self._current = self._next
            self._next = None
        self.refreshes += 1
        self._start_prefetch()
        return self._current
