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


def test_pallas_apply_no_semantic_no_viewdirs():
    """The fused field's no-sem / no-viewdir branches match flax too."""
    cfg = Config()
    cfg.model.trunk_depth = 3
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.use_semantic = False
    cfg.model.use_viewdirs = False
    cfg.model.compute_dtype = "float32"
    cfg.model.skips = (0,)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(3))

    pts = jax.random.normal(jax.random.key(4), (12, 5, 3)) * 0.3
    adapter = PallasApplyAdapter(cfg.model, has_fine=False, interpret=True)
    s_ref, r_ref, m_ref = model.apply(params, pts, None, level=0)
    s_pal, r_pal, m_pal = adapter.apply(params, pts, None, level=0)
    assert m_ref is None and m_pal is None
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), rtol=1e-4, atol=1e-4)


def test_pallas_field_gradients_match_flax():
    """Full-field custom VJP: dparams match XLA autodiff through flax."""
    cfg = Config()
    cfg.model.trunk_depth = 4
    cfg.model.trunk_width = 64
    cfg.model.color_width = 32
    cfg.model.num_classes = 5
    cfg.model.compute_dtype = "float32"
    cfg.model.skips = (1,)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    adapter = PallasApplyAdapter(cfg.model, has_fine=False, interpret=True)

    pts = jax.random.normal(jax.random.key(1), (64, 3)) * 0.3
    dirs = jax.random.normal(jax.random.key(2), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.key(5), (64, 3))

    def loss(apply_fn, p):
        sigma, rgb, sem = apply_fn(p, pts, dirs, level=0)
        return (jnp.mean((rgb - tgt) ** 2) + jnp.mean(sigma ** 2)
                + jnp.mean(sem ** 2))

    g_ref = jax.grad(lambda p: loss(model.apply, p))(params)
    g_pal = jax.grad(lambda p: loss(adapter.apply, p))(params)
    for ref, pal in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                   rtol=2e-3, atol=1e-5)


def test_pure_field_kernel_matches_flax():
    """The all-Pallas forward (fused_field_apply, kept for kernel R&D)
    matches flax as well as the default hybrid path."""
    from panopticnerf_tpu.ops.encoding import positional_encoding
    from panopticnerf_tpu.ops.pallas_field_train import FieldDims, fused_field_apply

    cfg = Config()
    cfg.model.trunk_depth = 4
    cfg.model.trunk_width = 64
    cfg.model.color_width = 32
    cfg.model.num_classes = 7
    cfg.model.compute_dtype = "float32"
    cfg.model.skips = (1,)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))

    pts = jax.random.normal(jax.random.key(1), (40, 3)) * 0.3
    dirs = jax.random.normal(jax.random.key(2), (40, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    s_ref, r_ref, m_ref = model.apply(params, pts, dirs, level=0)

    x_enc = positional_encoding(pts, cfg.model.xyz_freqs)
    d_enc = positional_encoding(dirs, cfg.model.dir_freqs)
    dims = FieldDims(
        x_dim=x_enc.shape[-1], d_dim=d_enc.shape[-1], width=64, sem_hidden=32,
        color_width=32, num_classes=7, layers=4,
        skips=(2,), use_sem=True,
    )
    s, r, m = fused_field_apply(params["params"]["coarse"], dims, x_enc, d_enc,
                                tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-4, atol=1e-4)


def test_small_coarse_field_matches_flax_and_grads():
    """model.coarse_trunk_depth/width: the coarse field is proposal-sized.
    The adapter must bypass the fused kernel for it and match the flax
    model's values AND gradients on both levels."""
    cfg = Config()
    cfg.model.trunk_depth = 4
    cfg.model.trunk_width = 64
    cfg.model.color_width = 32
    cfg.model.num_classes = 7
    cfg.model.compute_dtype = "float32"
    cfg.model.skips = (1,)
    cfg.model.coarse_trunk_depth = 2
    cfg.model.coarse_trunk_width = 32
    cfg.render.n_importance = 8
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    pc = params["params"]["coarse"]
    assert pc["trunk_0"]["kernel"].shape[1] == 32
    assert "trunk_2" not in pc          # proposal depth 2
    assert params["params"]["fine"]["trunk_3"]["kernel"].shape[1] == 64

    pts = jax.random.normal(jax.random.key(1), (10, 6, 3)) * 0.3
    dirs = jax.random.normal(jax.random.key(2), (10, 1, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    adapter = PallasApplyAdapter(cfg.model, has_fine=True, interpret=True)

    def scal(apply, p, level):
        s, r, m = apply(p, pts, dirs, level=level)
        return jnp.sum(s) + jnp.sum(r) + jnp.sum(m)

    for level in (0, 1):
        ref = model.apply(params, pts, dirs, level=level)
        pal = adapter.apply(params, pts, dirs, level=level)
        for a, b in zip(ref, pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)
        g_ref = jax.grad(lambda p: scal(model.apply, p, level))(params)
        g_pal = jax.grad(lambda p: scal(adapter.apply, p, level))(params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3), g_ref, g_pal)
