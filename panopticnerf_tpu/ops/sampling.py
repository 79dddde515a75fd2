"""Samplers: stratified, primitive-interval-guided, and hierarchical (inverse-CDF).

Reference behavior ([pn] lib/networks/renderer/panopticnerf.py, unverified —
SURVEY.md §2.2): stratified samples *inside ray/primitive intersection
intervals* (empty space skipped), plus an optional fine pass via inverse-CDF
over coarse weights.

TPU redesign: everything is static-shape, branch-free, gather-free and
sort-free. Interval selection uses a comparison-matrix 'searchsorted' (sum of
u >= cdf along K) followed by one-hot mul-reduces — dense VPU compares, never
dynamic lane indexing (measured ~4x slower on v5e, see CLAUDE.md). Samples
come out SORTED BY CONSTRUCTION: the stratified u is monotone, interval
selection walks a disjoint-union segment list, and coarse/fine streams are
combined with a rank-merge (`merge_sorted`) instead of jnp.sort — the bitonic
sort network dominated the round-1 sampler cost (~6 ms/step at the flagship
shape). Rays that hit no primitive fall back to full-range stratified
sampling via masked selects, not control flow.
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


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Gather-free stable merge of two row-sorted arrays (N, A) + (N, B).

    rank(a_i) = i + #{j : b_j < a_i}; rank(b_j) = j + #{i : a_i <= b_j}
    (the <= breaks ties a-first, so ranks are a permutation). The merged
    row is materialized with one-hot scatter mul-reduces. TPU note: a
    bitonic jnp.sort over the concatenation measured ~6 ms/step at the
    flagship shape; this compare-count + one-hot form is pure VPU work
    with no dynamic lane indexing.
    """
    n, s_a = a.shape
    s_b = b.shape[1]
    ra = jnp.arange(s_a)[None] + jnp.sum(b[:, None, :] < a[:, :, None], -1)
    rb = jnp.arange(s_b)[None] + jnp.sum(a[:, :, None] <= b[:, None, :], 1)
    pos = jnp.arange(s_a + s_b)
    oh_a = (ra[..., None] == pos).astype(a.dtype)              # (N, A, A+B)
    oh_b = (rb[..., None] == pos).astype(b.dtype)              # (N, B, A+B)
    return (a[..., None] * oh_a).sum(1) + (b[..., None] * oh_b).sum(1)


def _union_segments(iv: RayIntervals):
    """Disjoint ascending segments covering the union of entry-sorted
    (possibly overlapping) intervals: seg_in_k = max(t_in_k, prior end),
    seg_len_k = max(0, t_out_k - seg_in_k). Overlap regions are counted
    once (the raw per-interval CDF double-counts them) and, crucially,
    inverse-CDF samples over disjoint ascending segments come out SORTED."""
    end = jnp.where(iv.mask, iv.t_out, -1e9)
    prev_end = jnp.concatenate(
        [jnp.full_like(end[:, :1], -1e9), jax.lax.cummax(end, axis=1)[:, :-1]],
        axis=-1,
    )
    seg_in = jnp.maximum(iv.t_in, prev_end)
    seg_len = jnp.maximum(jnp.where(iv.mask, iv.t_out - seg_in, 0.0), 0.0)
    return seg_in, seg_len


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
    Splits the budget: ceil((1-bg_frac)*S) samples distributed over the
    union arc-length via inverse-CDF; the rest stratified over [near, far]
    so unannotated geometry (e.g. sky, distant buildings) still receives
    samples. Output: (N, S) sorted depths — by construction, no sort.
    """
    n = iv.t_in.shape[0]
    s_bg = max(int(round(n_samples * bg_frac)), 1) if bg_frac > 0 else 0
    s_in = n_samples - s_bg
    key_in, key_bg = jax.random.split(key)

    seg_in, seg_len = _union_segments(iv)                      # (N, K) each
    cdf = jnp.cumsum(seg_len, axis=-1)                         # (N, K)
    total = cdf[:, -1:]                                        # (N, 1)
    any_hit = total[:, 0] > 1e-8                               # (N,)

    # Stratified u over total covered length — monotone per ray.
    base = jnp.linspace(0.0, 1.0, s_in + 1)[:-1][None, :]      # (1, S_in)
    if perturb:
        jitter = jax.random.uniform(key_in, (n, s_in)) / s_in
    else:
        jitter = 0.5 / s_in
    u = (base + jitter) * total                                # (N, S_in)

    # Which segment: count of completed-cdf entries below u, then one-hot
    # mul-reduce selection (never take_along_axis — lane gathers are slow).
    k = seg_len.shape[-1]
    idx = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1)   # (N, S_in)
    idx = jnp.clip(idx, 0, k - 1)
    onehot = (idx[..., None] == jnp.arange(k)).astype(u.dtype)  # (N, S_in, K)
    sel = lambda v: jnp.sum(onehot * v[:, None, :], axis=-1)
    cdf_prev = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], axis=-1)
    z_in = sel(seg_in) + (u - sel(cdf_prev))                   # (N, S_in) sorted

    # Fallback for no-hit rays: full-range stratified (masked select, no cond).
    z_fallback = stratified_z(key_in, n, s_in, near, far, perturb)
    z_in = jnp.where(any_hit[:, None], z_in, z_fallback)

    if s_bg > 0:
        z_bg = stratified_z(key_bg, n, s_bg, near, far, perturb)
        return merge_sorted(z_in, z_bg)
    return z_in


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
        # Stratified jittered u — monotone per ray, so the inverse-CDF
        # output is SORTED by construction (classic NeRF draws iid uniforms
        # and sorts the merged set; stratification only reduces variance).
        base = jnp.linspace(0.0, 1.0, n_importance + 1)[:-1]
        u = base[None] + jax.random.uniform(key, (n, n_importance)) / n_importance
    else:
        u = jnp.linspace(0.0, 1.0, n_importance + 2)[1:-1]
        u = jnp.broadcast_to(u[None], (n, n_importance))

    # Comparison-matrix searchsorted: inds in [1, B] for u in [0, 1), then
    # one-hot mul-reduce selection of the bracketing cdf/bin values
    # (take_along_axis lane gathers measured ~4x slower on v5e).
    inds = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1)  # (N, S)
    below = jnp.clip(inds - 1, 0, b - 1)
    iota = jnp.arange(b + 1)
    oh_lo = (below[..., None] == iota).astype(u.dtype)         # (N, S, B+1)
    oh_hi = (jnp.clip(inds, 1, b)[..., None] == iota).astype(u.dtype)
    pick = lambda oh, v: jnp.sum(oh * v[:, None, :], axis=-1)
    cdf_lo = pick(oh_lo, cdf)
    cdf_hi = pick(oh_hi, cdf)
    z_lo = pick(oh_lo, bins)
    z_hi = pick(oh_hi, bins)

    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    frac = (u - cdf_lo) / denom
    return z_lo + frac * (z_hi - z_lo)


def merge_z(z_coarse: jnp.ndarray, z_fine: jnp.ndarray) -> jnp.ndarray:
    """Sorted union of coarse + fine depths: (N, Sc+Sf).

    Both inputs are row-sorted (guided/stratified coarse depths by
    construction; sample_pdf emits monotone depths), so this is a rank
    merge, not a sort."""
    return merge_sorted(z_coarse, z_fine)


def topm_eval_select(
    z_all: jnp.ndarray,
    z_mid: jnp.ndarray,
    w_interior: jnp.ndarray,
    m: int,
    last_delta: float = 1e10,
):
    """Keep the m highest-coarse-weight depths of the merged eval set
    (forward-only).

    The TPU-shaped form of early ray termination + empty-space culling
    (VERDICT round-3 item 2): instead of data-dependent loop exits — which
    jit cannot express without per-ray dynamic shapes — rank every merged
    sample by its coarse bin WEIGHT (alpha x transmittance) and statically
    keep the top m. The coarse weight already prices both exit conditions:
    post-surface bins carry ~zero weight because transmittance is spent
    (early termination), and gap bins carry ~zero weight because alpha is
    ~zero there (empty-space culling). Fine (importance) samples sit in
    high-weight bins by construction and survive; dropped samples carry
    ~zero composited contribution, which is what makes truncation exact
    (see tests).

    A mid-round-4 variant replaced the weight ranking with explicit
    threshold tests (cumulative-budget termination + mass culling, then
    truncate the DEEPEST survivors past m). Measured worse (-0.4 dB at
    keep=96 on the committed checkpoint, BASELINE.md round-4 keep-M table):
    when more than m samples pass the thresholds, depth truncation cuts
    samples the ray is still transmitting to, while weight ranking cuts the
    lowest-contribution samples wherever they sit. This restores the
    original top-M-by-weight semantics.

    Implementation note (round-4 full-res measurement): the original
    top_k(prio, m) + index-sort + 3x take_along_axis formulation REGRESSED
    2x at 376x1408 (529k rays) — lane-axis gathers are the documented v5e
    poison pattern (CLAUDE.md; sample_pdf above avoids them the same way).
    This form needs no gather at all: the bin-weight lookup is a one-hot
    mul-reduce, and the selection is two stable multi-operand lax.sorts —
    rank by descending weight (stability breaks ties nearest-first, same as
    top_k), slice the first m lanes, re-sort those by depth for
    compositing order.

    z_all: (N, S) sorted merged depths; z_mid: (N, Sc-1) coarse bin edges;
    w_interior: (N, Sc-2) coarse interior bin weights (the sample_pdf
    inputs). Returns (z_sel, delta_sel): (N, m) depths + integration deltas
    taken from the FULL set, so a skipped gap contributes zero instead of
    stretching the preceding sample's alpha.
    """
    n, s = z_all.shape
    if m >= s:
        return z_all, None
    delta_full = jnp.concatenate(
        [jnp.diff(z_all, axis=-1),
         jnp.full((n, 1), last_delta, z_all.dtype)], axis=-1)
    # Bin weight at each depth via one-hot mul-reduce (no lane gather). The
    # two boundary bins (before the first / after the last midpoint)
    # inherit their neighbor's weight.
    w_bins = jnp.concatenate(
        [w_interior[:, :1], w_interior, w_interior[:, -1:]], axis=-1)
    bin_idx = jnp.sum(z_all[:, :, None] >= z_mid[:, None, :], axis=-1)
    iota_b = jnp.arange(w_bins.shape[1])
    onehot = (bin_idx[..., None] == iota_b).astype(z_all.dtype)  # (N, S, B)
    prio = jnp.sum(onehot * w_bins[:, None, :], axis=-1)         # (N, S)

    # Top-m by weight: stable sort on -prio keeps ties in depth order
    # (nearest-first, matching top_k), then re-sort the kept m by depth.
    _, z_top, d_top = jax.lax.sort(
        (-prio, z_all, delta_full), dimension=-1, num_keys=1)
    z_sel, delta_sel = jax.lax.sort(
        (z_top[:, :m], d_top[:, :m]), dimension=-1, num_keys=1)
    return z_sel, delta_sel
