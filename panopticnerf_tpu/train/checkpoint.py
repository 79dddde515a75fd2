"""Checkpoint save/restore via orbax.

Reference: `save_model`/`load_model`/`load_network` in [pn]
lib/utils/net_utils.py (unverified — SURVEY.md §5.4): latest.pth with
net/optimizer/scheduler/recorder state + epoch, epoch-granular resume.
Rebuild: orbax CheckpointManager with *step*-granular save/restore (TPU
preemption-safe), same three entry points.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_model(state, directory: str, step: int, max_to_keep: int = 3) -> None:
    """Persist the full TrainState (params + optimizer + step) at `step`."""
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_model(state_template, directory: str, step: Optional[int] = None):
    """Restore a full TrainState; returns (state, step) or (template, None)
    when no checkpoint exists (reference `resume` semantics)."""
    mgr = _manager(directory)
    target = step if step is not None else mgr.latest_step()
    if target is None:
        mgr.close()
        return state_template, None
    restored = mgr.restore(target, args=ocp.args.StandardRestore(state_template))
    mgr.close()
    return restored, target


def load_network(params_template, directory: str, step: Optional[int] = None):
    """Weights-only restore for evaluation (reference `load_network`)."""
    import logging

    mgr = _manager(directory)
    target = step if step is not None else mgr.latest_step()
    if target is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    # Restore the raw pytree (no template needed) and keep params only.
    # Template-less restore is deliberate here (weights-only, any model
    # topology mismatch surfaces in the dtype-cast below) — silence orbax's
    # per-restore warnings about it so CLI output stays readable.
    absl_log = logging.getLogger("absl")
    prev = absl_log.level
    absl_log.setLevel(logging.ERROR)
    try:
        restored = mgr.restore(target)
    finally:
        absl_log.setLevel(prev)
        mgr.close()
    params = restored["params"]
    if params_template is not None:
        params = jax.tree.map(lambda t, x: x.astype(t.dtype), params_template, params)
    return params, target
