"""Landing-day fusion sweep: cached GT-view renders + host-side metric grid.

One render pass over a checkpoint's GT views caches the per-pixel fields
(learned logits, fixed-field mass, instance mass); every fusion variant
(interval-selection rule x `eval_fixed_blend`) is then a pure-numpy
re-fusion — 10 variants cost one render. Shared by `tools/pq_analysis.py`
(diagnostics: error maps, per-segment misses) and `tools/landing_sweep.py`
(the dress-rehearsal pick table, VERDICT round-4 item 5).

Reference: panoptic fusion + PQ evaluation in [pn] lib/evaluators/
(unverified — SURVEY.md §0); fusion lives in panopticnerf_tpu/eval/panoptic.py.
"""

from __future__ import annotations

import numpy as np


def cache_gt_views(cfg):
    """Render every GT-bearing view once; return (cached, views, step, things, C).

    Each cached entry carries the flat per-pixel arrays the fusion sweep
    and the error-map diagnostics need.
    """
    import jax

    from panopticnerf_tpu import engine
    from panopticnerf_tpu.eval import make_evaluator

    ds, test_ids, model, params, step = engine._restore_for_eval(cfg)
    mesh = engine._eval_mesh(cfg)
    render = jax.jit(
        lambda p, v: engine._render_view(cfg, model, p, ds, v, mesh=mesh))

    things = make_evaluator(cfg).things
    C = cfg.model.num_classes

    assert ds.gt_sem is not None, "fusion sweep needs GT semantic/instance maps"
    views = np.nonzero(np.asarray((ds.gt_sem != 255).any(axis=(1, 2))))[0].tolist()

    cached = []
    for v in views:
        out = render(params, int(v))
        cached.append(dict(
            sem_logits=np.asarray(out.sem_logits),
            sem_fixed=np.asarray(out.sem_fixed),
            inst_mass=np.asarray(out.inst_mass),
            inst_ids=np.asarray(out.inst_ids),
            inst_sem=np.asarray(out.inst_sem),
            gt_sem=np.asarray(ds.gt_sem[v]).reshape(-1),
            gt_inst=np.asarray(ds.gt_inst[v]).reshape(-1),
            valid=(np.asarray(ds.valid_mask[v]).reshape(-1)
                   if ds.valid_mask is not None else None),
        ))
    return cached, views, step, things, C, ds


def fusion_sweep(cached, things, C, blends, rules=("match", "raw"),
                 sky_rules=("off",), sky_class=0):
    """Host-side grid over (rule, blend, sky_rule); returns metric rows.

    `sky_rules`/`sky_class`: eval.sky_rule variants (empty-ray sky prior,
    eval/panoptic.py) — resolve `sky_class` via eval.resolve_sky_class.

    The whole grid runs on the host CPU backend: fuse_panoptic is eager
    jnp, and on a TPU-attached process each variant would otherwise
    re-upload the ~80 MB cached fields through the relay per fusion call
    (measured: the 30-variant grid blows the 40-min budget on the relay,
    seconds on CPU).
    """
    import jax

    from panopticnerf_tpu.eval import metrics
    from panopticnerf_tpu.eval.panoptic import fuse_panoptic

    cpu = jax.devices("cpu")[0]
    rows = []
    for sky in sky_rules:
        for rule in rules:
            for blend in blends:
                cm = np.zeros((C, C), np.int64)
                pq_stats = {"iou_sum": np.zeros(C), "tp": np.zeros(C, np.int64),
                            "fp": np.zeros(C, np.int64), "fn": np.zeros(C, np.int64)}
                for c in cached:
                    with jax.default_device(cpu):
                        sem, inst = fuse_panoptic(
                            c["sem_logits"], c["sem_fixed"], c["inst_mass"],
                            c["inst_ids"],
                            c["inst_sem"] if rule == "match" else None,
                            things, blend, sky_rule=sky, sky_class=sky_class)
                    sem, inst = np.asarray(sem), np.asarray(inst)
                    gt_sem = c["gt_sem"]
                    if c["valid"] is not None:
                        gt_sem = np.where(c["valid"], gt_sem, 255)
                    cm += np.asarray(metrics.confusion_matrix(sem, gt_sem, C))
                    st = metrics.panoptic_quality(
                        sem, inst, gt_sem, c["gt_inst"], things, C)
                    for k in pq_stats:
                        pq_stats[k] += st[k]
                _, miou = metrics.iou_from_confusion(cm)
                pq = metrics.pq_from_stats(pq_stats)
                pres = pq["present"]
                row = {"rule": rule, "blend": float(blend), "sky_rule": sky,
                       "miou": round(miou, 4), "pq": round(pq["mean_pq"], 4)}
                for name, sel in (("pq_things", things), ("pq_stuff", ~things)):
                    m = pres & sel[: len(pres)]
                    row[name] = round(float(pq["pq"][m].mean()), 4) if m.any() else None
                rows.append(row)
    return rows
