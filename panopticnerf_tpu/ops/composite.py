"""Alpha compositing (`raw2outputs`) for color/depth/semantics/instances.

Reference: `raw2outputs` in [pn] lib/networks/renderer/panopticnerf.py
(unverified — SURVEY.md §2.2): alpha = 1 - exp(-relu(sigma) * delta),
transmittance-weighted sums of rgb / depth / learned semantic logits /
fixed semantic distribution / per-primitive instance mass.

TPU design: one static-shape expression; the exclusive transmittance product
is a cumulative product along the (small, static) sample axis which XLA
lowers to a log-space scan fused with its consumers; everything else is
einsum/VPU. A Pallas fused version can drop in behind the same signature.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class CompositeOut(NamedTuple):
    rgb: jnp.ndarray          # (N, 3)
    depth: jnp.ndarray        # (N,)
    acc: jnp.ndarray          # (N,) total opacity
    weights: jnp.ndarray      # (N, S)
    sem_logits: Optional[jnp.ndarray]   # (N, C) composited learned logits
    sem_fixed: Optional[jnp.ndarray]    # (N, C) composited fixed distribution
    inst_mass: Optional[jnp.ndarray]    # (N, K) mass per kept interval


def compute_weights(
    sigma: jnp.ndarray, z: jnp.ndarray, far: float, last_delta: float = 1e10,
    delta: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Compositing weights w_i = alpha_i * prod_{j<i}(1 - alpha_j).

    sigma: (N, S) raw density (pre-activation, softplus applied here);
    z: (N, S) sorted depths. The final sample gets a large `last_delta`
    (classic NeRF convention) so any positive terminal density saturates —
    lets sky/background absorb remaining transmittance. An explicit `delta`
    overrides the z-derived spacing (the top-M eval truncation passes the
    FULL set's deltas so skipped gaps integrate as empty, not as stretched
    neighbors — ops.sampling.topm_eval_select).
    """
    if delta is None:
        delta = jnp.concatenate(
            [jnp.diff(z, axis=-1), jnp.full_like(z[:, :1], last_delta)],
            axis=-1)                                           # (N, S)
    density = jnp.logaddexp(sigma, 0.0)                        # softplus, stable
    tau = density * delta                                      # optical depth
    alpha = 1.0 - jnp.exp(-tau)
    # Exclusive transmittance: log(1 - alpha_i) == -tau_i exactly, so the
    # cumulative product is a cumsum in log space — numerically exact, no
    # epsilon, gradients stay finite even at alpha == 1.
    log_trans = -jnp.cumsum(tau, axis=-1)
    trans = jnp.exp(jnp.concatenate([jnp.zeros_like(log_trans[:, :1]), log_trans[:, :-1]], axis=-1))
    return alpha * trans


def composite(
    sigma: jnp.ndarray,
    rgb: jnp.ndarray,
    z: jnp.ndarray,
    far: float,
    sem_logits: Optional[jnp.ndarray] = None,
    sem_fixed: Optional[jnp.ndarray] = None,
    inside_intervals: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
    delta: Optional[jnp.ndarray] = None,
) -> CompositeOut:
    """Composite per-sample fields into per-ray maps.

    sigma: (N, S); rgb: (N, S, 3) post-sigmoid; z: (N, S) sorted;
    sem_logits: (N, S, C) learned semantic logits;
    sem_fixed: (N, S, C) optional dense fixed field (the renderer's hot path
    instead composites the fixed map K-factored, see
    ops.intersect.fixed_map_from_weights);
    inside_intervals: (N, S, K) bool containment (for instance mass).
    """
    w = compute_weights(sigma, z, far, delta=delta)             # (N, S)
    # NOTE: broadcast-multiply-reduce, NOT einsum — per-ray einsums lower to
    # thousands of tiny batched MXU matmuls on TPU; the VPU reduction is ~6x
    # faster at these shapes (measured on v5e).
    wsum = lambda field: jnp.sum(w[..., None] * field, axis=1)  # (N, S, C)->(N, C)
    rgb_map = wsum(rgb)
    depth_map = jnp.sum(w * z, axis=-1)
    acc = jnp.sum(w, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])

    sem_map = None
    if sem_logits is not None:
        sem_map = wsum(sem_logits)
    fixed_map = None
    if sem_fixed is not None:
        fixed_map = wsum(sem_fixed)
    inst_mass = None
    if inside_intervals is not None:
        inst_mass = wsum(inside_intervals.astype(w.dtype))

    return CompositeOut(
        rgb=rgb_map, depth=depth_map, acc=acc, weights=w,
        sem_logits=sem_map, sem_fixed=fixed_map, inst_mass=inst_mass,
    )
