import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.ops import intersect_rays, make_box_primitives
from panopticnerf_tpu.render import SceneBounds, render_image_rays, render_rays


def small_cfg(**over):
    cfg = Config()
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 32
    cfg.model.color_width = 16
    cfg.model.num_classes = 5
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.n_importance = 0
    cfg.render.near = 0.5
    cfg.render.far = 20.0
    cfg.render.ray_tile = 16
    for k, v in over.items():
        parts = k.split("__")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


BOUNDS = SceneBounds(center=jnp.zeros(3), scale=jnp.asarray(0.1))


def init_model(cfg):
    model = make_network(cfg)
    return model, init_params(model, jax.random.key(0))


def test_mlp_shapes_and_param_count():
    cfg = Config()  # full-size flagship
    cfg.render.n_importance = 0
    model, params = init_model(cfg)
    sigma, rgb, sem = model.apply(params, jnp.zeros((2, 3, 3)), jnp.zeros((2, 1, 3)), level=0)
    assert sigma.shape == (2, 3)
    assert rgb.shape == (2, 3, 3)
    assert sem.shape == (2, 3, 45)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert 400_000 < n_params < 2_000_000  # reference-scale MLP


def test_semantics_view_independent():
    cfg = small_cfg()
    model, params = init_model(cfg)
    pts = jax.random.normal(jax.random.key(1), (4, 2, 3))
    d1 = jnp.tile(jnp.array([[[0.0, 0, 1]]]), (4, 2, 1))
    d2 = jnp.tile(jnp.array([[[1.0, 0, 0]]]), (4, 2, 1))
    s1, r1, sem1 = model.apply(params, pts, d1, level=0)
    s2, r2, sem2 = model.apply(params, pts, d2, level=0)
    np.testing.assert_allclose(sem1, sem2, atol=1e-6)   # labels ignore view
    np.testing.assert_allclose(s1, s2, atol=1e-6)       # density ignores view
    assert not np.allclose(r1, r2)                      # color is view-dependent


def test_render_rays_shapes():
    cfg = small_cfg()
    model, params = init_model(cfg)
    o = jnp.zeros((6, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (6, 1))
    out = render_rays(model, params, o, d, BOUNDS, jax.random.key(0), cfg, train=True)
    assert out.rgb.shape == (6, 3)
    assert out.depth.shape == (6,)
    assert out.sem_logits.shape == (6, 5)
    assert out.z.shape == (6, 8)
    assert out.coarse is None


def test_render_rays_hierarchical():
    cfg = small_cfg(render__n_importance=4)
    model, params = init_model(cfg)
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    out = render_rays(model, params, o, d, BOUNDS, jax.random.key(0), cfg, train=True)
    assert out.z.shape == (4, 12)          # coarse 8 + fine 4, merged
    assert out.coarse is not None
    assert out.coarse.z.shape == (4, 8)
    assert (jnp.diff(out.z, axis=-1) >= 0).all()


def test_render_with_primitives_fixed_field():
    cfg = small_cfg(render__use_primitives=True, data__max_intervals=4)
    model, params = init_model(cfg)
    prims = make_box_primitives(
        jnp.array([[0.0, 0, 5]]), jnp.array([[4.0, 4, 4]]),
        jnp.eye(3)[None], jnp.array([3]), jnp.array([7]),
    )
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    iv = intersect_rays(o, d, prims, cfg.render.near, cfg.render.far, k=4)
    out = render_rays(model, params, o, d, BOUNDS, jax.random.key(0), cfg, iv=iv, train=True)
    assert out.sem_fixed.shape == (4, 5)
    assert out.inst_mass.shape == (4, 4)
    assert out.inst_ids.shape == (4, 4)
    # most fixed-field mass should be on class 3 (samples concentrate in box)
    assert (out.sem_fixed.argmax(-1) == 3).all()


def test_render_rays_jit_and_grad():
    cfg = small_cfg()
    model, params = init_model(cfg)
    o = jnp.zeros((8, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (8, 1))

    @jax.jit
    def loss(params):
        out = render_rays(model, params, o, d, BOUNDS, jax.random.key(0), cfg, train=True)
        return jnp.mean((out.rgb - 0.5) ** 2)

    g = jax.grad(loss)(params)
    flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g)])
    assert bool(jnp.isfinite(flat).all())
    assert float(jnp.abs(flat).max()) > 0


def test_render_image_rays_tiling():
    cfg = small_cfg()
    model, params = init_model(cfg)
    n = 37  # deliberately not a multiple of ray_tile=16
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1))
    out = jax.jit(lambda p: render_image_rays(model, p, o, d, BOUNDS, cfg))(params)
    assert out.rgb.shape == (n, 3)
    assert out.depth.shape == (n,)
    # tiled result must equal untiled render
    ref = render_rays(model, params, o, d, BOUNDS, jax.random.key(0), cfg, train=False)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=1e-5)


def test_bfloat16_compute_path():
    cfg = small_cfg()
    cfg.model.compute_dtype = "bfloat16"
    model, params = init_model(cfg)
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    out = render_rays(model, params, o, d, BOUNDS, jax.random.key(0), cfg, train=True)
    assert out.rgb.dtype == jnp.float32  # promoted before compositing
    assert bool(jnp.isfinite(out.rgb).all())
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))


def test_eval_sample_count_override():
    """render.eval_n_samples / eval_n_importance swap in at eval render
    time only (0/-1 = follow training); the tiled render honors them."""
    import dataclasses

    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.data.dataset import view_rays
    from panopticnerf_tpu.render.renderer import eval_render_cfg

    cfg = small_cfg(render__n_importance=8)
    assert eval_render_cfg(cfg) is cfg  # defaults: no-op

    cfg2 = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, eval_n_samples=4,
                                        eval_n_importance=0))
    ec = eval_render_cfg(cfg2)
    assert ec.render.n_samples == 4 and ec.render.n_importance == 0
    assert cfg2.render.n_samples == 8  # training cfg untouched

    cfg2.data.synthetic_image_hw = (16, 24)
    cfg2.data.synthetic_num_frames = 2
    ds = build_synthetic_dataset(cfg2, seed=0)
    model, params = init_model(cfg2)
    o, d = view_rays(ds, 0)
    cfg2.render.ray_tile = 128
    out = jax.jit(lambda p: render_image_rays(
        model, p, o, d, SceneBounds(ds.bounds_center, ds.bounds_scale), cfg2
    ))(params)
    assert out.rgb.shape == (o.shape[0], 3)
    assert bool(jnp.isfinite(out.rgb).all())


def test_eval_coarse_only_refused_with_proposal_coarse():
    """render.eval_n_importance 0 would render from the proposal-sized
    coarse field (model.coarse_trunk_depth/width) whose only trained role
    is importance weights — eval_render_cfg must refuse, not silently
    collapse quality."""
    import dataclasses

    import pytest

    from panopticnerf_tpu.render.renderer import eval_render_cfg

    cfg = small_cfg(render__n_importance=8, model__coarse_trunk_depth=1,
                    model__coarse_trunk_width=16)
    bad = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, eval_n_importance=0))
    with pytest.raises(ValueError, match="proposal"):
        eval_render_cfg(bad)
    # fine-field eval with fewer importance samples stays allowed
    ok = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, eval_n_importance=4))
    assert eval_render_cfg(ok).render.n_importance == 4
    # coarse-only eval of a full-size coarse field stays allowed
    full = small_cfg(render__n_importance=8)
    full2 = dataclasses.replace(
        full, render=dataclasses.replace(full.render, eval_n_importance=0))
    assert eval_render_cfg(full2).render.n_importance == 0
