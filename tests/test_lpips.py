"""Plumbing tests for the optional LPIPS metric (eval.lpips_weights).

Real weights are download-gated (see eval/lpips.py), so these tests use
RANDOM weights of the correct layout: they pin the plumbing — activation,
metric invariants, graceful skip — not the perceptual values.
"""

import numpy as np
import pytest

from panopticnerf_tpu.eval.lpips import LPIPS, _ALEX_LAYERS, make_lpips


def _random_weights(path, seed=0):
    rng = np.random.default_rng(seed)
    arrays = {}
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(_ALEX_LAYERS):
        arrays[f"conv{i}_w"] = rng.normal(
            0, 0.1, (out_ch, in_ch, k, k)).astype(np.float32)
        arrays[f"conv{i}_b"] = rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        arrays[f"lin{i}"] = np.abs(rng.normal(0, 1, (out_ch,))).astype(np.float32)
        in_ch = out_ch
    np.savez(path, **arrays)
    return str(path)


def test_lpips_metric_invariants(tmp_path):
    fn = LPIPS(_random_weights(tmp_path / "w.npz"))
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    b = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)   # identity -> 0
    d_ab, d_ba = fn(a, b), fn(b, a)
    assert d_ab > 1e-4                                  # different -> positive
    assert d_ab == pytest.approx(d_ba, rel=1e-4)        # symmetric
    # closer image pair scores lower than a far pair
    a_eps = np.clip(a + 0.01 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    assert fn(a, a_eps) < d_ab


def test_lpips_small_frame_returns_nan(tmp_path):
    fn = LPIPS(_random_weights(tmp_path / "w.npz"))
    tiny = np.zeros((24, 32, 3), np.float32)
    assert np.isnan(fn(tiny, tiny))


def test_make_lpips_graceful_skip(tmp_path):
    msgs = []
    assert make_lpips("", log=msgs.append) is None          # not configured
    assert msgs == []
    missing = make_lpips(str(tmp_path / "nope.npz"), log=msgs.append)
    assert missing is None and "LPIPS disabled" in msgs[-1]  # no file
    np.savez(tmp_path / "bad.npz", conv0_w=np.zeros((2, 2)))
    bad = make_lpips(str(tmp_path / "bad.npz"), log=msgs.append)
    assert bad is None and "missing arrays" in msgs[-1]      # malformed


def test_evaluator_emits_lpips_when_configured(tmp_path):
    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.eval import make_evaluator

    cfg = Config()
    cfg.model.num_classes = 4
    cfg.eval.lpips_weights = _random_weights(tmp_path / "w.npz")
    ev = make_evaluator(cfg)
    assert ev.lpips_fn is not None

    class Out:  # minimal RenderOut stand-in for the rgb path
        rgb = np.random.default_rng(0).uniform(size=(64 * 96, 3)).astype(np.float32)
        depth = None
        sem_logits = None
        sem_fixed = None

    gt = np.random.default_rng(2).uniform(size=(64 * 96, 3)).astype(np.float32)
    ev.evaluate(Out(), gt_rgb=gt, image_hw=(64, 96))
    res = ev.summarize()
    assert "lpips" in res and res["lpips"] > 0
    # and the default config stays LPIPS-free
    cfg2 = Config()
    cfg2.model.num_classes = 4
    assert make_evaluator(cfg2).lpips_fn is None
