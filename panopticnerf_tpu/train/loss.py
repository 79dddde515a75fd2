"""PanopticNeRF loss stack.

Reference: `NetworkWrapper` in [pn] lib/train/trainers/panopticnerf.py
(unverified — SURVEY.md §2.2/§3.1): L_rgb (MSE) + 2D CE of the *learned*
semantic rendering vs filtered pseudo-labels + 2D CE of the *fixed* semantic
rendering vs pseudo-labels (shapes geometry) + per-sample 3D semantic loss
inside primitives + sparse-depth L1, weighted per cfg.

Pseudo-label consistency filter (reference CLI `pseudo_filter`/`weight_th`):
a pixel's pseudo-label supervises the learned field only when the ray's
composited fixed-field mass on that class exceeds `weight_th` — i.e. the 2D
network opinion is consistent with the 3D primitive annotation along the ray.
Sky/stuff pixels with no primitives are exempt from the filter (no 3D
evidence either way), matching the papers' described behavior.

All losses are masked means over static-shape tensors; the two-stage
`pretrain nerf` schedule enters as a traced 0/1 `sem_scale` so the same jit
serves both stages.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.dataset import RayBatch
from panopticnerf_tpu.render.renderer import RenderOut


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                 axis_name: str | None = None) -> jnp.ndarray:
    """Masked mean; with `axis_name`, the GLOBAL masked mean across the
    named mesh axis (psum of numerator and denominator separately — a mean
    of per-shard masked means would weight shards with more masked-out
    elements wrongly). Exactness across shardings is what lets the
    shard_map train path reproduce single-device numerics bitwise."""
    m = mask.astype(x.dtype)
    num, den = jnp.sum(x * m), jnp.sum(m)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    m = logits.max(-1, keepdims=True)
    return logits - m - jnp.log(jnp.sum(jnp.exp(logits - m), -1, keepdims=True))


def cross_entropy_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE of integer labels vs logits (last axis = classes)."""
    logp = _log_softmax(logits)
    lab = jnp.clip(labels, 0, logits.shape[-1] - 1)
    return -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]


def cross_entropy_probs(probs: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """CE where predictions are (possibly unnormalized) probabilities."""
    total = jnp.sum(probs, axis=-1, keepdims=True)
    p = probs / jnp.maximum(total, eps)
    lab = jnp.clip(labels, 0, probs.shape[-1] - 1)
    sel = jnp.take_along_axis(p, lab[..., None], axis=-1)[..., 0]
    return -jnp.log(jnp.maximum(sel, eps))


def compute_losses(
    out: RenderOut,
    batch: RayBatch,
    cfg: Config,
    sem_scale: jnp.ndarray | float = 1.0,
    axis_name: str | None = None,
    agree_on: jnp.ndarray | float = 0.0,
    weight_th: jnp.ndarray | float | None = None,
):
    """Returns (total_loss, stats dict of scalars).

    With `axis_name` (inside shard_map over a mesh axis), every reduction
    is the exact GLOBAL value — loss, grads, and stats match the
    single-device computation bitwise for the same global batch.

    `agree_on` is the traced 0/1 activation of the late-stage
    self-agreement demotion (loss.agree_filter; the step computes it from
    state.step >= agree_start * max_steps so one jit serves both phases).

    `weight_th` overrides cfg.loss.weight_th with a traced scalar — the
    annealed consistency threshold (loss.weight_th_final; the step computes
    the schedule from state.step, train/step.weight_th_schedule).
    """
    lc = cfg.loss
    num_classes = cfg.model.num_classes
    stats = {}
    _mm = lambda x, m: _masked_mean(x, m, axis_name)

    ray_ok = batch.valid  # e.g. inside the fisheye image circle

    # --- RGB (fine + coarse, as in hierarchical NeRF) ---
    sq = jnp.mean((out.rgb - batch.rgb) ** 2, axis=-1)
    mse_fine = _mm(sq, ray_ok)
    l_rgb = mse_fine
    if out.coarse is not None:
        l_rgb = l_rgb + _mm(
            jnp.mean((out.coarse.rgb - batch.rgb) ** 2, axis=-1), ray_ok
        )
    stats["loss_rgb"] = l_rgb
    stats["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse_fine, 1e-10))
    total = lc.rgb_weight * l_rgb

    # --- sparse depth L1 ---
    if lc.depth_weight > 0:
        valid = (batch.depth > 0) & ray_ok
        l_depth = _mm(jnp.abs(out.depth - batch.depth), valid)
        if out.coarse is not None:
            l_depth = l_depth + _mm(jnp.abs(out.coarse.depth - batch.depth), valid)
        stats["loss_depth"] = l_depth
        total = total + lc.depth_weight * l_depth

    # --- semantics ---
    has_pseudo = (batch.pseudo != 255) & ray_ok
    soft_px = None  # graded empty-sky pixels (loss.empty_sky_weight)
    if out.sem_fixed is not None:
        fixed_map = out.sem_fixed                                  # (N, C)
        lab = jnp.clip(batch.pseudo, 0, num_classes - 1)
        class_mass = jnp.take_along_axis(fixed_map, lab[:, None], axis=-1)[:, 0]
        ray_has_prims = jnp.sum(fixed_map, axis=-1) > 1e-6
        if lc.pseudo_filter:
            th = lc.weight_th if weight_th is None else weight_th
            consistent = class_mass > th
            # Relative tests (loss.rel_filter_ratio / rel_filter_total):
            # the absolute bar alone passes any wrong class with SOME
            # primitive mass on the ray (overlapping boxes) — the round-4
            # structured-noise PQ^St floor. Requiring the pseudo class to
            # hold a share of the argmax/total mass breaks exactly that tie.
            if lc.rel_filter_ratio > 0:
                consistent &= class_mass >= (
                    lc.rel_filter_ratio * jnp.max(fixed_map, axis=-1))
            if lc.rel_filter_total > 0:
                consistent &= class_mass >= (
                    lc.rel_filter_total * jnp.sum(fixed_map, axis=-1))
            # no-primitive rays (sky etc.) keep their pseudo supervision.
            # With loss.empty_sky_filter, only when the label IS sky —
            # the round-5 root cause showed this exemption is the channel
            # that feeds GT-absent-class hallucinations (wrong labels on
            # empty rays train the learned field unfiltered).
            empty_ok = ~ray_has_prims
            if lc.empty_sky_filter:
                from panopticnerf_tpu.data.labels import sky_train_id

                is_sky = batch.pseudo == sky_train_id(num_classes)
                if lc.empty_sky_weight > 0:
                    # Graded form (loss.empty_sky_weight, the train-time
                    # twin of eval.sky_rule "soft:<w>"): the non-sky labels
                    # the hard filter drops on empty rays keep a reduced CE
                    # weight instead — partial supervision survives at
                    # annotation-coverage edges (the hard filter's measured
                    # clean-data cost) while the hallucination channel is
                    # still damped by (1 - weight).
                    soft_px = has_pseudo & empty_ok & ~is_sky
                empty_ok &= is_sky
            keep = has_pseudo & (consistent | empty_ok)
        else:
            keep = has_pseudo
        stats["filter_keep_frac"] = _mm(keep.astype(jnp.float32),
                                        jnp.ones_like(keep))

        # fixed-field 2D CE — only where the ray actually crosses primitives
        # (this is the geometry-shaping loss: gradients flow into density).
        # The consistency filter applies here only when loss.filter_fix2d is
        # set; by default only the learned-field supervision is filtered
        # (the papers' description — see LossConfig.filter_fix2d).
        if lc.fix2d_weight > 0:
            ce_fix = cross_entropy_probs(fixed_map, batch.pseudo)
            fix_keep = has_pseudo & ray_has_prims
            if lc.filter_fix2d:
                fix_keep = fix_keep & keep
            l_fix = _mm(ce_fix, fix_keep)
            stats["loss_sem_fix2d"] = l_fix
            total = total + sem_scale * lc.fix2d_weight * l_fix
    else:
        keep = has_pseudo

    if lc.agree_filter and out.sem_logits is not None and lc.sem2d_weight > 0:
        # Late-stage self-agreement demotion (loss.agree_filter): drop a
        # pseudo-label from the learned-field supervision when the learned
        # field confidently predicts a different class AND the fixed field
        # does not back the pseudo-label. Covers exactly the no-primitive
        # (sky) pixels the consistency filter exempts. stop_gradient: the
        # gate must not backprop into the prediction it reads.
        probs = jax.nn.softmax(jax.lax.stop_gradient(out.sem_logits), axis=-1)
        overrule = (
            (jnp.argmax(probs, axis=-1) != batch.pseudo)
            & (jnp.max(probs, axis=-1) > lc.agree_conf)
        )
        if out.sem_fixed is not None:
            lab_a = jnp.clip(batch.pseudo, 0, num_classes - 1)
            has_prims_a = jnp.sum(out.sem_fixed, axis=-1) > 1e-6
            fixed_backs_pseudo = has_prims_a & (
                jnp.argmax(out.sem_fixed, axis=-1) == lab_a
            )
            overrule = overrule & ~fixed_backs_pseudo
        demote = overrule & (jnp.asarray(agree_on, jnp.float32) > 0)
        keep = keep & ~demote
        if soft_px is not None:
            soft_px = soft_px & ~demote
        stats["agree_demote_frac"] = _mm(
            demote.astype(jnp.float32), jnp.ones_like(demote))

    if out.sem_logits is not None and lc.sem2d_weight > 0:
        ce2d = cross_entropy_logits(out.sem_logits, batch.pseudo)
        sem2d_w = keep
        if soft_px is not None:
            sem2d_w = (keep.astype(jnp.float32)
                       + lc.empty_sky_weight * soft_px.astype(jnp.float32))
        l_sem2d = _mm(ce2d, sem2d_w)
        stats["loss_sem2d"] = l_sem2d
        total = total + sem_scale * lc.sem2d_weight * l_sem2d

    # --- 3D per-sample loss: learned logits vs fixed distribution inside
    # primitives. Dense-target formulation: target = sum_k inside_k
    # onehot(sem_k) / cnt. (A lane-gather variant — take_along_axis over the
    # class axis — measured ~4x SLOWER on v5e; dynamic lane indexing is
    # poison on TPU. Keep the one-hot mul-reduce.)
    if (
        out.sample_sem_logits is not None
        and out.sample_inside_k is not None
        and lc.sem3d_weight > 0
    ):
        logits = out.sample_sem_logits                              # (N, S, C)
        sem_k = jnp.clip(out.inst_sem, 0, num_classes - 1)          # (N, K)
        onehot = jnp.where(
            (out.inst_sem >= 0)[..., None],
            jnp.eye(num_classes, dtype=logits.dtype)[sem_k],
            0.0,
        )                                                           # (N, K, C)
        inside = out.sample_inside_k.astype(logits.dtype)           # (N, S, K)
        cnt = out.sample_cnt
        target = (
            jnp.sum(inside[..., None] * onehot[:, None], axis=2)
            / jnp.maximum(cnt, 1.0)[..., None]
        )                                                           # (N, S, C)
        ce3d = -jnp.sum(target * _log_softmax(logits), axis=-1)     # (N, S)
        l_sem3d = _mm(ce3d, cnt > 0)
        stats["loss_sem3d"] = l_sem3d
        total = total + sem_scale * lc.sem3d_weight * l_sem3d

    stats["loss_total"] = total
    return total, stats
