"""Polyak/EMA weight averaging (train.ema_decay).

The EMA complements save_best on the documented noisy-pseudo-label metric
decay (BASELINE.md long-run note): save_best picks a step, the EMA smooths
within one. These tests pin the update rule, the eval-weight selection,
and the checkpoint roundtrip (both the full-state resume and the
weights-only prefer_ema restore).
"""

import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.train import make_train_state, make_train_step
from panopticnerf_tpu.train.step import eval_params


def _cfg(ema=0.9):
    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 4
    cfg.data.synthetic_num_boxes = 3
    cfg.data.n_rays = 64
    cfg.data.max_primitives = 4
    cfg.data.max_intervals = 2
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.num_classes = 4
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    cfg.train.ema_decay = ema
    return cfg


def _leaf0(tree):
    return np.asarray(jax.tree.leaves(tree)[0])


def test_ema_matches_manual_recursion():
    """state.ema_params reproduces the warmup-corrected recursion
    ema_t = d_eff * ema_{t-1} + (1 - d_eff) * params_t applied to the
    observed params trajectory, d_eff = min(decay, (1+t)/(10+t))."""
    cfg = _cfg(ema=0.9)
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)

    manual = state.params
    key = jax.random.key(3)
    for _ in range(5):
        state, _ = step(state, ds, jnp.arange(4), key)
        t = float(state.step)
        d = min(0.9, (1.0 + t) / (10.0 + t))
        manual = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                              manual, state.params)
    np.testing.assert_allclose(_leaf0(state.ema_params), _leaf0(manual),
                               rtol=1e-6, atol=1e-7)
    # the average genuinely lags the raw weights
    assert not np.allclose(_leaf0(state.ema_params), _leaf0(state.params))


def test_eval_params_selects_ema_only_when_tracked():
    cfg = _cfg(ema=0.0)
    model = make_network(cfg)
    p = init_params(model, jax.random.key(0))
    s_off = make_train_state(cfg, model, p)
    assert s_off.ema_params is None
    assert eval_params(s_off) is s_off.params

    s_on = make_train_state(_cfg(ema=0.99), model, p)
    assert s_on.ema_params is not None
    assert eval_params(s_on) is s_on.ema_params


def test_ema_checkpoint_roundtrip(tmp_path):
    """save_model persists the EMA subtree; load_model resumes it;
    load_network(prefer_ema=True) restores the averaged weights while the
    default restore keeps the raw params."""
    from panopticnerf_tpu.train.checkpoint import load_model, load_network, save_model

    cfg = _cfg(ema=0.9)
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    for _ in range(3):
        state, _ = step(state, ds, jnp.arange(4), jax.random.key(1))

    d = str(tmp_path / "ckpt")
    save_model(state, d, int(state.step))

    template = make_train_state(cfg, model, init_params(model, jax.random.key(9)))
    restored, got = load_model(template, d)
    assert got == int(state.step)
    np.testing.assert_array_equal(_leaf0(restored.ema_params),
                                  _leaf0(state.ema_params))

    raw, _ = load_network(state.params, d)
    np.testing.assert_array_equal(_leaf0(raw), _leaf0(state.params))
    ema, _ = load_network(state.params, d, prefer_ema=True)
    np.testing.assert_array_equal(_leaf0(ema), _leaf0(state.ema_params))
    assert not np.array_equal(_leaf0(ema), _leaf0(raw))
