import numpy as np
import pytest

from panopticnerf_tpu.eval import metrics
from panopticnerf_tpu.eval import (
    confusion_matrix,
    iou_from_confusion,
    panoptic_quality,
    pq_from_stats,
    psnr,
)


def test_psnr_known_value():
    gt = np.zeros((4, 4, 3))
    pred = np.full((4, 4, 3), 0.1)
    assert psnr(pred, gt) == pytest.approx(20.0, abs=1e-6)
    assert psnr(gt, gt) > 100


def test_confusion_matrix_and_miou():
    gt = np.array([0, 0, 1, 1, 2, 255])
    pred = np.array([0, 1, 1, 1, 0, 2])
    cm = np.asarray(confusion_matrix(pred, gt, 3))
    assert cm.sum() == 5  # ignore dropped
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 2 and cm[2, 0] == 1
    iou, miou = iou_from_confusion(cm)
    # class0: tp=1 fp=1 fn=1 -> 1/3; class1: tp=2 fp=1 fn=0 -> 2/3; class2: 0
    assert iou[0] == pytest.approx(1 / 3)
    assert iou[1] == pytest.approx(2 / 3)
    assert iou[2] == pytest.approx(0.0)
    assert miou == pytest.approx((1 / 3 + 2 / 3 + 0) / 3)


def _pq(pred_sem, pred_inst, gt_sem, gt_inst, things, C=4):
    st = panoptic_quality(
        np.array(pred_sem), np.array(pred_inst),
        np.array(gt_sem), np.array(gt_inst),
        np.array(things), C,
    )
    return pq_from_stats(st)


def test_pq_perfect_match():
    # one stuff class (0), one thing class (1) with two instances
    gt_sem = np.array([0, 0, 1, 1, 1, 1])
    gt_inst = np.array([0, 0, 1, 1, 2, 2])
    r = _pq(gt_sem, gt_inst, gt_sem, gt_inst, [False, True, False, False])
    assert r["mean_pq"] == pytest.approx(1.0)
    assert r["pq"][0] == pytest.approx(1.0)  # stuff segment matched
    assert r["pq"][1] == pytest.approx(1.0)  # both instances matched


def test_pq_instance_split_penalized():
    # GT: one instance of class 1 over 8 px. Pred: split into two 4-px instances.
    gt_sem = np.ones(8, int)
    gt_inst = np.ones(8, int)
    pred_inst = np.array([1, 1, 1, 1, 2, 2, 2, 2])
    r = _pq(gt_sem, pred_inst * 0 + gt_sem * 0 + 1, gt_sem, gt_inst, [False, True])
    # pred instances each have IoU 0.5 with GT (not > 0.5) -> no TP: 1 FN + 2 FP
    r = _pq(np.ones(8, int), pred_inst, gt_sem, gt_inst, [False, True])
    assert r["pq"][1] == pytest.approx(0.0)
    st = panoptic_quality(np.ones(8, int), pred_inst, gt_sem, gt_inst,
                          np.array([False, True]), 2)
    assert st["fn"][1] == 1 and st["fp"][1] == 2


def test_pq_partial_iou():
    # GT instance covers 10 px; pred covers 8 of them + misses 2 (pred size 8).
    gt_sem = np.ones(12, int)
    gt_inst = np.array([1] * 10 + [0] * 2)
    gt_sem[10:] = 0  # last two px are stuff class 0
    pred_sem = np.array([1] * 8 + [0] * 4)  # pred instance covers first 8 only
    pred_inst = np.array([5] * 8 + [0] * 4)
    r = _pq(pred_sem, pred_inst, gt_sem, gt_inst, [False, True])
    # IoU = 8/10 = 0.8 -> TP with SQ 0.8, RQ 1 -> PQ_thing = 0.8
    assert r["pq"][1] == pytest.approx(0.8)


def test_pq_class_confusion_is_fp_and_fn():
    gt_sem = np.ones(6, int)
    gt_inst = np.ones(6, int)
    pred_sem = np.full(6, 2)
    pred_inst = np.ones(6, int)
    st = panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst,
                          np.array([False, True, True]), 3)
    assert st["tp"].sum() == 0
    assert st["fn"][1] == 1
    assert st["fp"][2] == 1


def test_pq_ignore_region_dropped():
    gt_sem = np.array([255, 255, 1, 1])
    gt_inst = np.array([0, 0, 1, 1])
    pred_sem = np.array([1, 1, 1, 1])
    pred_inst = np.array([1, 1, 1, 1])
    st = panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst,
                          np.array([False, True]), 2)
    r = pq_from_stats(st)
    # within valid region, IoU = 1 -> perfect
    assert r["pq"][1] == pytest.approx(1.0)


def test_pq_majority_void_pred_dropped_from_fp():
    """panopticapi convention: an unmatched predicted segment with >50% of
    its area over void ground truth is dropped, NOT counted FP. Hand case:
    gt valid on pixels 0-3 (class1 inst1), void on 4-9; pred inst1 covers
    pixels 2-9 (8 px, 6 void -> 75%): IoU = 2/(4+8-2-6) = 0.5, no match;
    pred is majority-void -> only the FN for the gt segment remains."""
    gt_sem = np.array([1, 1, 1, 1] + [255] * 6)
    gt_inst = np.array([1, 1, 1, 1] + [0] * 6)
    pred_sem = np.array([0, 0] + [1] * 8)
    pred_inst = np.array([0, 0] + [1] * 8)
    things = np.array([False, True])
    st = panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst, things, 2)
    assert st["tp"].sum() == 0
    assert st["fn"][1] == 1
    assert st["fp"].sum() == 1  # the class-0 stuff pred (fully valid) is FP
    assert st["fp"][0] == 1 and st["fp"][1] == 0  # void-majority seg dropped


def test_pq_minority_void_pred_still_fp():
    """Control: an unmatched pred segment only 40% in void stays FP."""
    # gt: pixels 0-5 class0 stuff; 6-9 void. pred: class1 inst1 on 3-7
    # (5 px, 2 void -> 40%): wrong class, minority-void -> FP for class 1.
    gt_sem = np.array([0] * 6 + [255] * 4)
    gt_inst = np.zeros(10, int)
    pred_sem = np.array([0, 0, 0, 1, 1, 1, 1, 1, 0, 0])
    pred_inst = np.array([0, 0, 0, 1, 1, 1, 1, 1, 0, 0])
    things = np.array([False, True])
    st = panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst, things, 2)
    assert st["fp"][1] == 1
    # class-0 pred (5 px, 2 void = 40%): valid IoU 3/(6+5-3-2) = 0.5 -> no
    # match, minority-void -> also FP; its gt counterpart is FN.
    assert st["fp"][0] == 1
    assert st["fn"][0] == 1


def test_pq_void_overlap_excluded_from_union():
    """Match IoU uses full pred area minus its void overlap (panopticapi's
    union adjustment): pred inst1 on pixels 1-8 (8 px, 5 void), gt inst1 on
    0-3 -> IoU = 3/(4+8-3-5) = 0.75 -> TP despite the void spill."""
    gt_sem = np.array([1, 1, 1, 1] + [255] * 6)
    gt_inst = np.array([1, 1, 1, 1] + [0] * 6)
    pred_sem = np.array([0] + [1] * 8 + [0])
    pred_inst = np.array([0] + [1] * 8 + [0])
    things = np.array([False, True])
    st = panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst, things, 2)
    assert st["tp"][1] == 1
    assert st["iou_sum"][1] == pytest.approx(0.75)
    assert st["fn"][1] == 0 and st["fp"][1] == 0


# ------------------------------------------------------------- SSIM / depth
def test_ssim_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (24, 32, 3))
    assert metrics.ssim(img, img) == pytest.approx(1.0)


def test_ssim_constant_images_analytic():
    # Constant images have zero variance/covariance everywhere, so SSIM
    # reduces to the luminance term (2ab+C1)/(a^2+b^2+C1) exactly.
    a, b = 0.3, 0.6
    pred = np.full((20, 20), a)
    gt = np.full((20, 20), b)
    c1 = 0.01 ** 2
    expect = (2 * a * b + c1) / (a * a + b * b + c1)
    assert metrics.ssim(pred, gt) == pytest.approx(expect, rel=1e-9)


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(1)
    img = rng.uniform(0.2, 0.8, (32, 48, 3))
    s1 = metrics.ssim(img, np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1))
    s2 = metrics.ssim(img, np.clip(img + rng.normal(0, 0.15, img.shape), 0, 1))
    assert 1.0 > s1 > s2


def test_ssim_mask_excludes_corrupted_region():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (24, 40))
    bad = img.copy()
    bad[:, 25:] = rng.uniform(0, 1, (24, 15))  # corrupt right side
    mask = np.zeros((24, 40), bool)
    mask[:, :18] = True  # valid centers >= 7 px from the corruption (win 11)
    assert metrics.ssim(img, bad, mask) == pytest.approx(1.0)
    assert metrics.ssim(img, bad) < 0.99


def test_depth_error_sums_hand_computed():
    pred = np.array([1.0, 2.0, 4.0, 9.0])
    gt = np.array([1.0, 2.0, 2.0, 0.0])  # last px: SGM hole (gt<=0)
    s = metrics.depth_error_sums(pred, gt)
    assert s["n"] == 3
    assert s["se_sum"] == pytest.approx(4.0)       # (4-2)^2
    assert s["absrel_sum"] == pytest.approx(1.0)   # |4-2|/2
    assert s["delta125"] == 2                      # ratios 1, 1, 2
    d = metrics.depth_from_sums(s)
    assert d["depth_rmse"] == pytest.approx(np.sqrt(4.0 / 3.0))
    assert d["depth_abs_rel"] == pytest.approx(1.0 / 3.0)
    assert d["depth_delta125"] == pytest.approx(2.0 / 3.0)


def test_evaluator_reports_ssim_and_depth():
    from types import SimpleNamespace

    from panopticnerf_tpu.eval.evaluator import Evaluator

    h, w = 16, 20
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 1, (h * w, 3))
    depth = rng.uniform(1, 10, h * w)
    out = SimpleNamespace(rgb=rgb, depth=depth * 1.1, sem_logits=None,
                          sem_fixed=None, inst_mass=None, inst_ids=None,
                          inst_sem=None)
    ev = Evaluator(num_classes=4, things=np.zeros(4, bool))
    ev.evaluate(out, gt_rgb=rgb, gt_depth=depth, image_hw=(h, w))
    res = ev.summarize()
    assert res["ssim"] == pytest.approx(1.0)
    assert res["depth_abs_rel"] == pytest.approx(0.1, rel=1e-6)
    assert res["depth_delta125"] == 1.0
    assert "depth_rmse" in res and res["depth_rmse"] > 0


def test_pq_things_stuff_split():
    """summarize() reports the panopticapi category split: PQ^Th over
    instance classes, PQ^St over stuff, each averaged over present
    classes only."""
    from panopticnerf_tpu.eval.evaluator import Evaluator

    # classes: 0 stuff (perfect), 1 thing (IoU 3/4 TP), 2 stuff (1px FP)
    gt_sem = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    gt_inst = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    pred_sem = np.array([0, 0, 0, 0, 1, 1, 1, 2])
    pred_inst = np.array([0, 0, 0, 0, 1, 1, 1, 0])
    things = np.array([False, True, False, False])
    st = panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst, things, 4)

    ev = Evaluator(num_classes=4, things=things)
    ev.pq_stats = st
    res = ev.summarize()
    assert res["pq_things"] == pytest.approx(0.75)
    assert res["pq_stuff"] == pytest.approx(0.5)  # mean(1.0 perfect, 0.0 FP)
    assert res["pq"] == pytest.approx((1.0 + 0.75 + 0.0) / 3)
    assert "PQ_th: 0.750" in ev.summary_table()


def test_evaluator_fusion_rule_raw_vs_match():
    """eval.fusion_rule plumbing: "match" prefers the interval whose
    primitive class agrees with the fused semantic argmax; "raw" takes the
    raw mass argmax — constructed so the two rules pick different
    instances for the same pixel."""
    from types import SimpleNamespace

    from panopticnerf_tpu.eval.evaluator import Evaluator

    things = np.array([False, True, True, False])
    # one pixel: learned says class 1; intervals: id 7 (class 1, mass .3),
    # id 9 (class 2, mass .6). match -> 7; raw -> 9.
    out = SimpleNamespace(
        rgb=np.full((1, 3), 0.5), depth=None,
        sem_logits=np.array([[0.0, 5.0, 0.0, 0.0]]),
        sem_fixed=None,
        inst_mass=np.array([[0.3, 0.6]]),
        inst_ids=np.array([[7, 9]]),
        inst_sem=np.array([[1, 2]]),
    )
    picks = {}
    for rule in ("match", "raw"):
        ev = Evaluator(num_classes=4, things=things, fusion_rule=rule)
        sem, inst = ev.evaluate(
            out, gt_rgb=np.full((1, 3), 0.5),
            gt_sem=np.array([1]), gt_inst=np.array([7]), image_hw=(1, 1),
        )
        picks[rule] = (int(sem[0]), int(inst[0]))
    assert picks["match"] == (1, 7)
    assert picks["raw"][1] == 9

def test_sky_rule_empty_and_support():
    """eval.sky_rule (round-5 PQ^St root cause fix): pixels whose ray
    gathers no composited fixed mass relabel to sky; "support" further
    confines the argmax to classes with per-pixel fixed support (+ sky).
    Class table: 0=road, 1=car(thing), 2=sidewalk, 3=sky."""
    from panopticnerf_tpu.eval.panoptic import fuse_panoptic

    things = np.array([False, True, False, False])
    # Three pixels:
    #  p0: empty ray (no fixed mass), learned hallucinates sidewalk(2)
    #  p1: road-only fixed support, learned hallucinates sidewalk(2)
    #  p2: road+sidewalk overlap, learned says sidewalk — must SURVIVE
    sem_logits = np.array([
        [0.0, 0.0, 5.0, 0.0],
        [1.0, 0.0, 5.0, 0.0],
        [1.0, 0.0, 5.0, 0.0],
    ])
    sem_fixed = np.array([
        [0.0, 0.0, 0.0, 0.0],
        [0.5, 0.0, 0.0, 0.5],
        [0.5, 0.0, 0.4, 0.0],
    ])

    def fuse(rule):
        sem, _ = fuse_panoptic(sem_logits, sem_fixed, None, None, None,
                               things, fixed_blend=0.5,
                               sky_rule=rule, sky_class=3)
        return np.asarray(sem).tolist()

    assert fuse("off") == [2, 2, 2]            # reference fusion, blend 0.5
    assert fuse("empty") == [3, 2, 2]          # only the empty ray flips
    assert fuse("support") == [3, 0, 2]        # p1 confined to road|sky; p2 kept


def test_sky_rule_soft_endpoints_and_confidence():
    """"soft:<w>" is the graded support rule: w=1 matches "support", w=0
    matches "off", and at intermediate w a CONFIDENT learned prediction on
    an empty ray survives the sky prior while a weak mixture flips."""
    from panopticnerf_tpu.eval.panoptic import fuse_panoptic

    things = np.array([False, True, False, False])

    def fuse(logits, fixed, rule):
        sem, _ = fuse_panoptic(logits, fixed, None, None, None, things,
                               fixed_blend=0.5, sky_rule=rule, sky_class=3)
        return np.asarray(sem).tolist()

    rng = np.random.RandomState(1)
    logits = rng.randn(32, 4).astype(np.float32) * 3
    fixed = np.abs(rng.randn(32, 4)).astype(np.float32)
    fixed[::3] = 0.0           # empty rays
    fixed[1::3, 2] = 0.0       # some unsupported-class pixels
    assert fuse(logits, fixed, "soft:1") == fuse(logits, fixed, "support")
    assert fuse(logits, fixed, "soft:0") == fuse(logits, fixed, "off")

    # Empty ray, graded prior: confident road survives w=0.4; a weak
    # sidewalk/sky mixture flips to sky at the same w.
    logits2 = np.array([
        [8.0, 0.0, 0.0, 0.0],   # confident road on an empty ray
        [0.0, 0.0, 0.6, 0.4],   # weak sidewalk-vs-sky mixture, empty ray
    ])
    fixed2 = np.zeros((2, 4))
    assert fuse(logits2, fixed2, "soft:0.4") == [0, 3]
    assert fuse(logits2, fixed2, "support") == [3, 3]   # hard rule forces both
    # bare "soft" defaults to w=0.5
    assert fuse(logits2, fixed2, "soft") == fuse(logits2, fixed2, "soft:0.5")


def test_sky_rule_off_matches_legacy_and_requires_fixed():
    """sky_rule="off" is bit-identical to the pre-knob fusion, and the rule
    is a no-op without a fixed field (nothing to read emptiness from)."""
    from panopticnerf_tpu.eval.panoptic import fuse_panoptic

    things = np.array([False, True, False, False])
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 4).astype(np.float32)
    fixed = np.abs(rng.randn(16, 4)).astype(np.float32)
    fixed[::3] = 0.0
    base, _ = fuse_panoptic(logits, fixed, None, None, None, things, 0.5)
    off, _ = fuse_panoptic(logits, fixed, None, None, None, things, 0.5,
                           sky_rule="off", sky_class=3)
    assert np.array_equal(np.asarray(base), np.asarray(off))
    # no fixed field -> sky_rule silently off
    nofix, _ = fuse_panoptic(logits, None, None, None, None, things, 0.5,
                             sky_rule="empty", sky_class=3)
    assert np.asarray(nofix).shape == (16,)


def test_resolve_sky_class_auto():
    """-1 resolves to the labels-table sky trainId for KITTI-360 class
    counts and to class 0 for synthetic fixtures; explicit ids pass through."""
    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.data import labels as L
    from panopticnerf_tpu.eval import resolve_sky_class

    cfg = Config()
    cfg.model.num_classes = L.NUM_TRAIN_IDS
    assert resolve_sky_class(cfg) == L.TRAINID_NAME.index("sky")
    cfg.model.num_classes = 4
    assert resolve_sky_class(cfg) == 0
    cfg.eval.sky_class = 2
    assert resolve_sky_class(cfg) == 2


def test_evaluator_sky_rule_plumbing():
    """make_evaluator carries eval.sky_rule into fusion: a no-fixed-mass
    pixel whose learned field hallucinates a GT-absent class scores 0 IoU
    for that class under "off" and flips to sky under "empty"."""
    from types import SimpleNamespace

    from panopticnerf_tpu.eval.evaluator import Evaluator

    things = np.array([False, True, False, False])
    out = SimpleNamespace(
        rgb=np.full((2, 3), 0.5), depth=None,
        sem_logits=np.array([[0.0, 0.0, 5.0, 0.0], [5.0, 0.0, 0.0, 0.0]]),
        sem_fixed=np.array([[0.0, 0.0, 0.0, 0.0], [0.9, 0.0, 0.0, 0.0]]),
        inst_mass=None, inst_ids=None, inst_sem=None,
    )
    gt = dict(gt_sem=np.array([3, 0]), gt_inst=np.array([0, 0]))
    res = {}
    for rule in ("off", "empty"):
        ev = Evaluator(num_classes=4, things=things, sky_rule=rule,
                       sky_class=3)
        sem, _ = ev.evaluate(out, **gt)
        res[rule] = np.asarray(sem).tolist()
    assert res["off"] == [2, 0]    # hallucinated sidewalk on the empty ray
    assert res["empty"] == [3, 0]  # sky rule removes it

def test_fusion_sweep_sky_rule_grid():
    """fusion_sweep grids over sky_rules and the rows carry the column —
    the landing-day pick table covers the round-5 sky-rule knob."""
    from panopticnerf_tpu.eval.sweep import fusion_sweep

    things = np.array([False, True, False, False])
    cached = [dict(
        sem_logits=np.array([[0.0, 0.0, 5.0, 0.0], [5.0, 0.0, 0.0, 0.0]]),
        sem_fixed=np.array([[0.0, 0.0, 0.0, 0.0], [0.9, 0.0, 0.0, 0.0]]),
        inst_mass=np.zeros((2, 1)), inst_ids=np.zeros((2, 1), np.int32),
        inst_sem=np.zeros((2, 1), np.int32),
        gt_sem=np.array([3, 0]), gt_inst=np.array([0, 0]), valid=None,
    )]
    rows = fusion_sweep(cached, things, 4, blends=[0.5], rules=("match",),
                        sky_rules=("off", "empty"), sky_class=3)
    by = {r["sky_rule"]: r for r in rows}
    assert set(by) == {"off", "empty"}
    # the empty-ray hallucination costs mIoU under "off", not under "empty"
    assert by["empty"]["miou"] > by["off"]["miou"]
