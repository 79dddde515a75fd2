"""Panoptic fusion: rendered fields -> (semantic, instance) label maps.

PanopticNeRF's panoptic output (papers; BASELINE.json north star): semantics
from the rendered (learned) semantic field; instance ids are NOT learned —
they come from the 3D bounding primitives. Per pixel, the visible instance
is the primitive interval carrying the most compositing mass along the ray.

Fusion rule implemented here:
  sem(p)  = argmax_c composited learned logits   (fallback: fixed field)
  inst(p) = inst_ids[argmax_k inst_mass]  if sem(p) is a 'thing' class and
            the winning interval agrees with sem(p) where possible; else 0.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def fuse_panoptic(
    sem_logits: Optional[jnp.ndarray],   # (N, C) composited learned logits
    sem_fixed: Optional[jnp.ndarray],    # (N, C) composited fixed distribution
    inst_mass: Optional[jnp.ndarray],    # (N, K) per-interval opacity mass
    inst_ids: Optional[jnp.ndarray],     # (N, K)
    inst_sem: Optional[jnp.ndarray],     # (N, K) interval semantic ids
    things: np.ndarray,                  # (C,) bool thing-class table
    fixed_blend: float = 0.5,
    sky_rule: str = "off",
    sky_class: Optional[int] = None,
    empty_eps: float = 1e-4,
):
    """Returns (sem (N,), inst (N,)) int32 device arrays.

    `fixed_blend`: convex blend of learned softmax and (normalized) fixed
    distribution before the argmax — the papers fuse both fields for the
    final label transfer; 0 = learned only, 1 = fixed only.

    `sky_rule` (eval.sky_rule): the 3D annotation covers every non-sky
    surface, so a pixel whose ray gathers no composited fixed mass can only
    be sky — "empty" relabels such pixels `sky_class`; "support" also
    zeroes fused probabilities of classes without per-pixel fixed support
    (sky always kept), confining the argmax to annotation-backed classes.
    "off" (default) is the reference fusion. Round-5 PQ^St root cause:
    blob-noise supervision on no-primitive pixels is exempt from the
    train-time consistency filter, and the learned field alone decides
    those pixels at eval — a GT-absent class can survive there and zero
    out its PQ/IoU; this rule removes it without retraining.

    "soft:<w>" (w in [0,1]) is the graded form of "support": instead of a
    hard mask it scales unsupported-class probabilities by (1-w) and, on
    empty rays, blends the fused distribution toward the sky one-hot with
    weight w — so a CONFIDENT learned prediction can overrule the prior.
    w=1 is bit-equivalent to "support"; w=0 to "off". Built for the
    measured cost of the hard rules on clean data (annotation-coverage
    edges where a true non-sky pixel's ray gathers no fixed mass get
    forced to sky — BASELINE.md round-5 sky-rule section): the learned
    field is confident exactly there, so a soft prior keeps the
    noise-regime win while sparing coverage-edge pixels.
    """
    assert sem_logits is not None or sem_fixed is not None
    probs = None
    if sem_logits is not None:
        probs = jnp.exp(
            sem_logits
            - sem_logits.max(-1, keepdims=True)
            - jnp.log(jnp.sum(jnp.exp(sem_logits - sem_logits.max(-1, keepdims=True)), -1, keepdims=True))
        )
    if sem_fixed is not None:
        fixed = sem_fixed / jnp.maximum(sem_fixed.sum(-1, keepdims=True), 1e-6)
        has_fixed = sem_fixed.sum(-1, keepdims=True) > 1e-6
        if probs is None:
            probs = jnp.where(has_fixed, fixed, 0.0)
        elif fixed_blend > 0:
            probs = jnp.where(has_fixed, (1 - fixed_blend) * probs + fixed_blend * fixed, probs)
    empty = None
    if sem_fixed is not None and sky_rule != "off" and sky_class is not None:
        empty = sem_fixed.sum(-1) <= empty_eps
        C = sem_fixed.shape[-1]
        sky_onehot = jnp.arange(C) == sky_class
        supported = (sem_fixed > empty_eps) | sky_onehot
        if sky_rule == "support":
            probs = jnp.where(supported, probs, 0.0)
        elif sky_rule.startswith("soft"):
            w = float(sky_rule.split(":", 1)[1]) if ":" in sky_rule else 0.5
            demoted = jnp.where(supported, probs, (1.0 - w) * probs)
            toward_sky = (1.0 - w) * probs + w * jnp.where(sky_onehot, 1.0, 0.0)
            probs = jnp.where(empty[:, None], toward_sky, demoted)
            empty = None  # the blend decides empty rays; no hard pin
    sem = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    if empty is not None:
        # Applies to both modes: on an empty ray "support" leaves only the
        # sky column, but if its probability is exactly 0 argmax would fall
        # back to class 0 — pin it explicitly.
        sem = jnp.where(empty, jnp.int32(sky_class), sem)

    things_j = jnp.asarray(np.asarray(things, bool))
    is_thing = things_j[jnp.clip(sem, 0, things_j.shape[0] - 1)]

    if inst_mass is None or inst_ids is None:
        return sem, jnp.zeros_like(sem)

    # Prefer intervals whose primitive class matches the pixel's semantic
    # class; fall back to raw mass argmax when none matches.
    if inst_sem is not None:
        match = inst_sem == sem[:, None]
        mass_pref = jnp.where(match, inst_mass, -1.0)
        any_match = jnp.any(match & (inst_mass > 0), axis=-1)
        k_star = jnp.where(
            any_match, jnp.argmax(mass_pref, axis=-1), jnp.argmax(inst_mass, axis=-1)
        )
    else:
        k_star = jnp.argmax(inst_mass, axis=-1)
    inst = jnp.take_along_axis(inst_ids, k_star[:, None], axis=-1)[:, 0]
    # Pixels with no primitive mass at all, or stuff pixels, get instance 0.
    has_mass = jnp.max(inst_mass, axis=-1) > 1e-4
    inst = jnp.where(is_thing & has_mass, inst, 0).astype(jnp.int32)
    return sem, inst
