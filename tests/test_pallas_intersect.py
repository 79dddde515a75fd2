"""Fused Pallas intersection kernel vs the XLA reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.ops import intersect_rays, make_box_primitives
from panopticnerf_tpu.ops.pallas_intersect import intersect_rays_pallas


def _scene(seed=0, p=12):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-6, 6, (p, 3))
    centers[:, 2] = rng.uniform(4, 18, p)
    sizes = rng.uniform(0.8, 4.0, (p, 3))
    q, _ = np.linalg.qr(rng.normal(size=(p, 3, 3)))
    q[:, :, 0] *= np.linalg.det(q)[:, None]
    valid = rng.uniform(size=p) > 0.15
    return make_box_primitives(
        jnp.asarray(centers, jnp.float32), jnp.asarray(sizes, jnp.float32),
        jnp.asarray(q, jnp.float32),
        jnp.asarray(rng.integers(0, 19, p)), jnp.asarray(rng.integers(1, 900, p)),
        jnp.asarray(valid),
    )


def _rays(seed=1, n=100):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("k", [4, 16])
def test_pallas_intersect_matches_xla(k):
    prims = _scene()
    o, d = _rays()
    ref = intersect_rays(o, d, prims, 0.5, 40.0, k)
    out = intersect_rays_pallas(o, d, prims, 0.5, 40.0, k, tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(np.asarray(out.t_in)[m], np.asarray(ref.t_in)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.t_out)[m], np.asarray(ref.t_out)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.semantic)[m], np.asarray(ref.semantic)[m])
    np.testing.assert_array_equal(np.asarray(out.instance)[m], np.asarray(ref.instance)[m])
    # padding slots carry the canonical encodings
    np.testing.assert_array_equal(np.asarray(out.semantic)[~m], -1)


def test_pallas_intersect_no_hits():
    prims = _scene(seed=3, p=4)
    o = jnp.asarray(np.full((8, 3), 100.0, np.float32))
    d = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (8, 1)))
    out = intersect_rays_pallas(o, d, prims, 0.5, 40.0, 4, tile=8, interpret=True)
    assert not bool(np.asarray(out.mask).any())


def test_eval_render_with_pallas_intersect_flag():
    """engine render path with render.use_pallas_intersect matches XLA."""
    import jax

    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.engine import _render_view
    from panopticnerf_tpu.models import init_params, make_network

    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 3
    cfg.data.synthetic_num_boxes = 3
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
    cfg.render.ray_tile = 128
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))

    ref = _render_view(cfg, model, params, ds, 1)
    cfg.render.use_pallas_intersect = True
    out = _render_view(cfg, model, params, ds, 1)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.sem_fixed), np.asarray(ref.sem_fixed), atol=1e-4)


def _prism_cut_planes(sides=5, max_planes=8):
    """Convex prism cut planes via the annotation pipeline helpers."""
    from panopticnerf_tpu.data.annotation3d import convex_cut_planes

    ang = np.linspace(0, 2 * np.pi, sides, endpoint=False)
    ring = np.stack([np.cos(ang), np.sin(ang)], 1)
    ring = ring / np.abs(ring).max()
    verts = np.concatenate([
        np.concatenate([ring, np.full((sides, 1), -1.0)], 1),
        np.concatenate([ring, np.full((sides, 1), 1.0)], 1),
    ])
    return convex_cut_planes(verts, max_planes)


@pytest.mark.parametrize("k", [4, 8])
def test_pallas_intersect_cut_planes_matches_xla(k):
    """In-kernel convex half-space refinement == the XLA cut-plane path."""
    from panopticnerf_tpu.ops.intersect import Primitives

    base = _scene(seed=5, p=8)
    planes = np.tile(np.array([0, 0, 0, 1], np.float32), (8, 8, 1))
    cp = np.asarray(_prism_cut_planes(), np.float32)
    planes[::2] = cp  # every other primitive is a pentagon prism
    prims = Primitives(*base[:4], cut_planes=jnp.asarray(planes))
    o, d = _rays(seed=6, n=64)

    ref = intersect_rays(o, d, prims, 0.5, 40.0, k)
    out = intersect_rays_pallas(o, d, prims, 0.5, 40.0, k, tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(np.asarray(out.t_in)[m], np.asarray(ref.t_in)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.t_out)[m], np.asarray(ref.t_out)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.semantic)[m], np.asarray(ref.semantic)[m])


@pytest.mark.parametrize("with_planes", [False, True])
def test_grouped_train_intervals_pallas_matches_xla(with_planes):
    """batch_intervals(use_pallas=True) == XLA on the grouped train path.
    with_planes injects per-view convex cut planes (the synthetic dataset
    is cuboid-only, so the plane branch needs them grafted on) — this is
    the exact path concave KITTI-360 annotations take at train time."""
    import jax

    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.data.dataset import batch_intervals, sample_ray_batch
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset

    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 6
    cfg.data.synthetic_num_boxes = 5
    cfg.data.max_primitives = 8
    cfg.data.max_intervals = 4
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    ds = build_synthetic_dataset(cfg, seed=0)
    if with_planes:
        v, p = ds.prim_valid.shape
        planes = np.tile(np.array([0, 0, 0, 1], np.float32), (v, p, 6, 1))
        cp = np.asarray(_prism_cut_planes(sides=5, max_planes=6), np.float32)
        planes[:, ::2] = cp  # every other primitive becomes a pentagon prism
        ds = ds._replace(prim_planes=jnp.asarray(planes))
    g = 4
    batch = sample_ray_batch(jax.random.key(7), ds, jnp.arange(6), 128, g)

    ref = batch_intervals(ds, batch, 0.5, 40.0, 4, g)
    out = batch_intervals(ds, batch, 0.5, 40.0, 4, g, use_pallas=True,
                          pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(np.asarray(out.t_in)[m], np.asarray(ref.t_in)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.t_out)[m], np.asarray(ref.t_out)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.semantic)[m],
                                  np.asarray(ref.semantic)[m])
    np.testing.assert_array_equal(np.asarray(out.instance)[m],
                                  np.asarray(ref.instance)[m])


def test_train_step_with_pallas_intersect_flag():
    """A full train step with render.use_pallas_intersect runs and produces
    a finite loss on the grouped path."""
    import jax

    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 4
    cfg.data.synthetic_num_boxes = 4
    cfg.data.n_rays = 64
    cfg.data.views_per_batch = 4
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
    cfg.render.use_pallas_intersect = True
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    state2, stats = step(state, ds, jnp.arange(4), jax.random.key(1))
    assert np.isfinite(float(stats["loss_total"]))
    assert int(state2.step) == 1
