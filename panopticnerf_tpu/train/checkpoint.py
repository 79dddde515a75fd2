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


def _manager(directory: str, max_to_keep: int = 3,
             create: bool = True) -> ocp.CheckpointManager:
    """create=False for READ paths: a probing load (e.g. `train.eval_step
    -1` before any best was saved) must not litter empty checkpoint roots —
    an empty `<exp>_best/` dir would also shadow the legacy-location
    fallback in engine._restore_for_eval."""
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=create),
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
    mgr = _manager(directory, create=False)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_model(state_template, directory: str, step: Optional[int] = None):
    """Restore a full TrainState; returns (state, step) or (template, None)
    when no checkpoint exists (reference `resume` semantics)."""
    if not os.path.isdir(directory):
        return state_template, None
    mgr = _manager(directory, create=False)
    target = step if step is not None else mgr.latest_step()
    if target is None:
        mgr.close()
        return state_template, None
    restored = mgr.restore(target, args=ocp.args.StandardRestore(state_template))
    mgr.close()
    return restored, target


def load_network(params_template, directory: str, step: Optional[int] = None,
                 strict: bool = True, prefer_ema: bool = False):
    """Weights-only restore (reference `load_network`).

    strict=True (evaluation): checkpoint topology must match the model —
    a config/checkpoint mismatch fails loudly instead of silently
    evaluating half-fresh weights. strict=False (warm start): partial
    merge — see _merge_params.
    prefer_ema=True (train.ema_decay runs): restore the checkpoint's
    Polyak-averaged weights when it carries them, the raw params otherwise.
    """
    import logging

    if not os.path.isdir(directory):
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    mgr = _manager(directory, create=False)
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
    if prefer_ema and restored.get("ema_params"):
        params = restored["ema_params"]
    if params_template is not None:
        if strict:
            params = jax.tree.map(lambda t, x: x.astype(t.dtype),
                                  params_template, params)
        else:
            copied = [0]
            params = _merge_params(params_template, params, copied=copied)
            total = len(jax.tree.leaves(params_template))
            if copied[0] == 0:
                raise ValueError(
                    f"warm start from {directory}: no checkpoint leaf matched "
                    f"the model's parameter tree (0/{total}) — wrong "
                    f"experiment directory or incompatible model")
            if copied[0] < total:
                import warnings

                warnings.warn(
                    f"warm start from {directory}: merged {copied[0]}/{total} "
                    f"leaves; the rest keep fresh initialization",
                    stacklevel=2)
    return params, target


def _merge_params(template, restored, path: str = "", copied=None):
    """Copy every checkpoint leaf whose path+shape matches the template;
    keep the template (fresh init) elsewhere.

    This is what makes the reference's `pretrain nerf` staging work across
    topology changes: a geometry-pretrained coarse-only NeRF warm-starts
    the coarse field of a coarse+fine(+semantic-head) model, while the
    subtrees absent from the checkpoint (fine field, new heads) keep their
    fresh initialization. Mismatched shapes (e.g. a resized semantic head)
    also fall back to the template, with a warning.
    """
    import warnings

    if isinstance(template, dict):
        out = {}
        for k, t in template.items():
            if isinstance(restored, dict) and k in restored:
                out[k] = _merge_params(t, restored[k], f"{path}/{k}", copied)
            else:
                out[k] = t  # absent from checkpoint: keep fresh init
        return out
    if hasattr(restored, "shape") and tuple(restored.shape) == tuple(template.shape):
        if copied is not None:
            copied[0] += 1
        return restored.astype(template.dtype)
    warnings.warn(
        f"warm start: shape mismatch at {path or '<root>'} "
        f"(ckpt {getattr(restored, 'shape', None)} vs model {template.shape}) "
        f"— keeping fresh initialization for it", stacklevel=2)
    return template
