"""Training recorder: smoothed scalar stats + JSONL (+ optional TensorBoard).

Reference: `Recorder`/`SmoothedValue` in [pn] lib/train/recorder.py
(unverified — SURVEY.md §5.5): TensorBoard scalars with moving-average
console lines every log_interval. Rebuild keeps the same surface but writes
newline-delimited JSON unconditionally (greppable, no TF dependency on the
hot path) and TensorBoard when tensorflow is importable.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Mapping


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.values = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, v: float):
        self.values.append(v)
        self.total += v
        self.count += 1

    @property
    def median(self) -> float:
        s = sorted(self.values)
        return s[len(s) // 2] if s else 0.0

    @property
    def avg(self) -> float:
        return sum(self.values) / len(self.values) if self.values else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class Recorder:
    def __init__(self, record_dir: str, use_tensorboard: bool = True,
                 write: bool = True):
        """write=False keeps the smoothed stats (log_line) but touches no
        files — multi-host runs pass write=(process_index == 0) so only the
        lead host owns the JSONL/TensorBoard streams."""
        self.record_dir = record_dir
        self.jsonl_path = os.path.join(record_dir, "metrics.jsonl")
        self._jsonl = None
        if write:
            os.makedirs(record_dir, exist_ok=True)
            self._jsonl = open(self.jsonl_path, "a")
        self.stats = defaultdict(SmoothedValue)
        self.step = 0
        self._tb = None
        if use_tensorboard and write:
            try:
                import tensorflow as tf  # noqa: PLC0415

                self._tb = tf.summary.create_file_writer(record_dir)
            except Exception:
                self._tb = None
        self._t_last = time.time()

    def update(self, scalars: Mapping[str, float], step: int | None = None):
        if step is not None:
            self.step = step
        for k, v in scalars.items():
            self.stats[k].update(float(v))

    def record(self, prefix: str = "train"):
        """Flush current smoothed values at self.step."""
        if self._jsonl is None:
            return
        payload = {"step": self.step, "prefix": prefix}
        payload.update({k: v.avg for k, v in self.stats.items()})
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf  # noqa: PLC0415

            with self._tb.as_default():
                for k, v in self.stats.items():
                    tf.summary.scalar(f"{prefix}/{k}", v.avg, step=self.step)
                self._tb.flush()

    def log_line(self, epoch: int, max_epoch: int, lr: float, extra: str = "") -> str:
        now = time.time()
        dt = now - self._t_last
        self._t_last = now
        core = "  ".join(f"{k}: {v.avg:.4f}" for k, v in sorted(self.stats.items()))
        return f"epoch {epoch}/{max_epoch}  step {self.step}  lr {lr:.2e}  {core}  ({dt:.1f}s) {extra}"

    def close(self):
        """Idempotent: run_train closes in its finally block, and callers
        (tests, staged runs) may close again."""
        if self._jsonl is not None and not self._jsonl.closed:
            self._jsonl.close()
