"""Samplers: stratified, primitive-interval-guided, and hierarchical (inverse-CDF).

Reference behavior ([pn] lib/networks/renderer/panopticnerf.py, unverified —
SURVEY.md §2.2): stratified samples *inside ray/primitive intersection
intervals* (empty space skipped), plus an optional fine pass via inverse-CDF
over coarse weights.

TPU redesign: everything is static-shape and branch-free. Interval selection
uses a comparison-matrix 'searchsorted' (sum of u >= cdf along K), which maps
to dense VPU compares instead of per-ray binary searches. Rays that hit no
primitive fall back to full-range stratified sampling via masked selects, not
control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from panopticnerf_tpu.ops.intersect import RayIntervals


def stratified_z(
    key: jax.Array, n_rays: int, n_samples: int, near, far, perturb: bool
) -> jnp.ndarray:
    """Uniform stratified depths in [near, far]. near/far: scalar or (N, 1)."""
    t = jnp.linspace(0.0, 1.0, n_samples + 1)[:-1]             # (S,) bin starts
    if perturb:
        u = jax.random.uniform(key, (n_rays, n_samples))
    else:
        u = jnp.full((n_rays, n_samples), 0.5)
    frac = (t[None, :] + u / n_samples)                        # (N, S) in [0,1)
    near = jnp.asarray(near)
    far = jnp.asarray(far)
    return near + (far - near) * frac


def guided_z(
    key: jax.Array,
    iv: RayIntervals,
    n_samples: int,
    near: float,
    far: float,
    perturb: bool,
    bg_frac: float = 0.25,
) -> jnp.ndarray:
    """Stratified samples inside the union of a ray's intervals (+ background).

    iv: entry-sorted per-ray intervals (t_in/t_out = BIG where invalid).
    Splits the budget: ceil((1-bg_frac)*S) samples distributed over interval
    arc-length via inverse-CDF; the rest stratified over [near, far] so
    unannotated geometry (e.g. sky, distant buildings) still receives
    samples. Output: (N, S) sorted depths.
    """
    n = iv.t_in.shape[0]
    s_bg = max(int(round(n_samples * bg_frac)), 1) if bg_frac > 0 else 0
    s_in = n_samples - s_bg
    key_in, key_bg = jax.random.split(key)

    lengths = jnp.where(iv.mask, iv.t_out - iv.t_in, 0.0)      # (N, K)
    cdf = jnp.cumsum(lengths, axis=-1)                         # (N, K)
    total = cdf[:, -1:]                                        # (N, 1)
    any_hit = total[:, 0] > 1e-8                               # (N,)

    # Stratified u over total covered length.
    base = jnp.linspace(0.0, 1.0, s_in + 1)[:-1][None, :]      # (1, S_in)
    if perturb:
        jitter = jax.random.uniform(key_in, (n, s_in)) / s_in
    else:
        jitter = 0.5 / s_in
    u = (base + jitter) * total                                # (N, S_in)

    # Which interval: count of completed-cdf entries below u (VPU compare-sum).
    idx = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1)   # (N, S_in)
    idx = jnp.clip(idx, 0, lengths.shape[-1] - 1)
    cdf_prev = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], axis=-1)
    offset = u - jnp.take_along_axis(cdf_prev, idx, axis=-1)
    z_in = jnp.take_along_axis(iv.t_in, idx, axis=-1) + offset  # (N, S_in)

    # Fallback for no-hit rays: full-range stratified (masked select, no cond).
    z_fallback = stratified_z(key_in, n, s_in, near, far, perturb)
    z_in = jnp.where(any_hit[:, None], z_in, z_fallback)

    if s_bg > 0:
        z_bg = stratified_z(key_bg, n, s_bg, near, far, perturb)
        z = jnp.concatenate([z_in, z_bg], axis=-1)
    else:
        z = z_in
    return jnp.sort(z, axis=-1)


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    perturb: bool,
) -> jnp.ndarray:
    """Hierarchical fine sampling: inverse-CDF over coarse weights.

    bins: (N, B+1) depth bin edges; weights: (N, B) unnormalized mass per bin
    (classic NeRF passes coarse-z midpoints as edges and interior weights).
    Returns (N, n_importance) depths (unsorted; caller merges+sorts).
    """
    n, b = weights.shape
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, B+1)

    if perturb:
        u = jax.random.uniform(key, (n, n_importance))
    else:
        u = jnp.linspace(0.0, 1.0, n_importance + 2)[1:-1]
        u = jnp.broadcast_to(u[None], (n, n_importance))

    # Comparison-matrix searchsorted: inds in [1, B] for u in [0, 1).
    inds = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1)  # (N, S)
    below = jnp.clip(inds - 1, 0, b - 1)
    above = jnp.clip(inds, 1, b)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    z_lo = jnp.take_along_axis(bins, below, axis=-1)
    z_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    frac = (u - cdf_lo) / denom
    return z_lo + frac * (z_hi - z_lo)


def merge_z(z_coarse: jnp.ndarray, z_fine: jnp.ndarray) -> jnp.ndarray:
    """Sorted union of coarse + fine depths: (N, Sc+Sf)."""
    return jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)
