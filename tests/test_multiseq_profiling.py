import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data import concat_datasets
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.utils.profiling import timed


def _cfg(num_classes=4):
    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 3
    cfg.data.synthetic_num_boxes = 3
    cfg.data.max_primitives = 4
    cfg.model.num_classes = num_classes
    return cfg


def test_concat_datasets_views_and_bounds():
    cfg = _cfg()
    a = build_synthetic_dataset(cfg, seed=0)
    b = build_synthetic_dataset(cfg, seed=1)
    ds = concat_datasets([a, b])
    assert ds.images.shape[0] == 6
    assert ds.prim_w2p.shape == (6, 4, 3, 4)
    # envelope radius >= each part's radius
    assert float(1 / ds.bounds_scale) >= float(1 / a.bounds_scale) - 1e-6
    np.testing.assert_array_equal(np.asarray(ds.gt_sem[:3]), np.asarray(a.gt_sem))


def test_concat_mixed_optional_fields():
    cfg = _cfg()
    a = build_synthetic_dataset(cfg, seed=0)
    # give b fisheye-style fields; a has none
    b = build_synthetic_dataset(cfg, seed=1)
    b = b._replace(
        cam_model=jnp.ones((3,), jnp.int32),
        fisheye=jnp.tile(jnp.asarray([10, 10, 8, 12, 2.0, 0, 0], jnp.float32), (3, 1)),
        valid_mask=jnp.zeros((3, 16, 24), bool),
    )
    ds = concat_datasets([a, b])
    assert ds.cam_model.tolist() == [0, 0, 0, 1, 1, 1]
    assert bool(ds.valid_mask[:3].all()) and not bool(ds.valid_mask[3:].any())


def test_multiseq_trains():
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    cfg = _cfg()
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.use_primitives = True
    cfg.render.far = 40.0
    cfg.data.n_rays = 32
    cfg.data.max_intervals = 2
    ds = concat_datasets([build_synthetic_dataset(cfg, 0), build_synthetic_dataset(cfg, 1)])
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    _, stats = step(state, ds, jnp.arange(6), jax.random.key(0))
    assert np.isfinite(float(stats["loss_total"]))


def test_timed_helper():
    f = jax.jit(lambda x: x * 2)
    dt = timed(f, jnp.ones(16), iters=3)
    assert dt > 0
