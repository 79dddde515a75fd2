"""Pallas forward path must match flax model.apply numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.models.pallas_apply import PallasApplyAdapter


def test_pallas_apply_matches_flax():
    cfg = Config()
    cfg.model.trunk_depth = 4
    cfg.model.trunk_width = 64
    cfg.model.color_width = 32
    cfg.model.num_classes = 7
    cfg.model.compute_dtype = "float32"
    cfg.model.skips = (1,)  # a skip that actually triggers (layer 2 consumes PE)
    cfg.render.n_importance = 8  # exercise the fine branch too
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))

    pts = jax.random.normal(jax.random.key(1), (10, 6, 3)) * 0.3
    dirs = jax.random.normal(jax.random.key(2), (10, 1, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    adapter = PallasApplyAdapter(cfg.model, has_fine=True, interpret=True)
    for level in (0, 1):
        s_ref, r_ref, m_ref = model.apply(params, pts, dirs, level=level)
        s_pal, r_pal, m_pal = adapter.apply(params, pts, dirs, level=level)
        np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref), rtol=1e-4, atol=1e-4)


def test_pallas_render_path():
    """render_rays accepts the adapter as a model."""
    from panopticnerf_tpu.render import SceneBounds, render_rays

    cfg = Config()
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.num_classes = 4
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.n_importance = 0
    cfg.render.near = 0.5
    cfg.render.far = 20.0
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    adapter = PallasApplyAdapter(cfg.model, has_fine=False, interpret=True)

    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    bounds = SceneBounds(jnp.zeros(3), jnp.asarray(0.1))
    ref = render_rays(model, params, o, d, bounds, jax.random.key(0), cfg, train=False)
    pal = render_rays(adapter, params, o, d, bounds, jax.random.key(0), cfg, train=False)
    np.testing.assert_allclose(np.asarray(pal.rgb), np.asarray(ref.rgb), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-4)
