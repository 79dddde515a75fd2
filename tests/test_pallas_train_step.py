"""use_pallas=True train step must reproduce the flax step's numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.train import make_train_state, make_train_step


def _cfg():
    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 4
    cfg.data.synthetic_num_boxes = 3
    cfg.data.n_rays = 64
    cfg.data.max_primitives = 4
    cfg.data.max_intervals = 2
    cfg.model.trunk_depth = 3
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.num_classes = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.skips = (1,)
    cfg.render.n_samples = 8
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    return cfg


def test_pallas_train_step_matches_flax():
    cfg = _cfg()
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    key = jax.random.key(7)
    vids = jnp.arange(4)

    s_ref = make_train_state(cfg, model, params)
    step_ref = make_train_step(cfg, model, donate=False)
    s_ref, stats_ref = step_ref(s_ref, ds, vids, key)

    cfg.model.use_pallas = True
    s_pal = make_train_state(cfg, model, params)
    step_pal = make_train_step(cfg, model, donate=False)
    s_pal, stats_pal = step_pal(s_pal, ds, vids, key)

    np.testing.assert_allclose(
        float(stats_pal["loss_total"]), float(stats_ref["loss_total"]), rtol=1e-4
    )
    a = np.asarray(jax.tree.leaves(s_ref.params)[0])
    b = np.asarray(jax.tree.leaves(s_pal.params)[0])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_pallas_train_step_descends():
    cfg = _cfg()
    cfg.model.use_pallas = True
    cfg.train.lr = 5e-3
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    key = jax.random.key(0)  # per-step variation comes from the on-device fold
    losses = []
    for _ in range(60):
        state, stats = step(state, ds, jnp.arange(4), key)
        losses.append(float(stats["loss_total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-15:]) < np.mean(losses[:15])
