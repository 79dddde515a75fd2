import jax
import jax.numpy as jnp
import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.stream import HostViews, ViewWindowStreamer
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset


def _host():
    cfg = Config()
    cfg.data.synthetic_image_hw = (16, 24)
    cfg.data.synthetic_num_frames = 10
    cfg.data.synthetic_num_boxes = 3
    cfg.data.max_primitives = 4
    cfg.model.num_classes = 4
    return cfg, HostViews.from_device(build_synthetic_dataset(cfg, 0))


def test_window_slices_views():
    cfg, host = _host()
    ds = host.window(np.array([2, 5, 7]))
    assert ds.images.shape[0] == 3
    np.testing.assert_array_equal(np.asarray(ds.c2w[0]), host.arrays["c2w"][2])
    # scalars untouched
    assert ds.bounds_center.shape == (3,)


def test_streamer_rotates_and_keeps_shapes():
    cfg, host = _host()
    st = ViewWindowStreamer(host, window_size=4, seed=0)
    ds0, ids0 = st.current()
    assert ds0.images.shape[0] == 4
    ds1, ids1 = st.advance()
    assert ds1.images.shape == ds0.images.shape  # no recompile needed
    ds2, ids2 = st.advance()
    # windows actually rotate (with 10 choose 4, collision thrice is unlikely)
    assert not (set(ids0) == set(ids1) == set(ids2))


def test_streamer_trains_across_windows():
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state, make_train_step

    cfg, host = _host()
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 8
    cfg.render.use_primitives = True
    cfg.render.far = 40.0
    cfg.data.n_rays = 32
    cfg.data.max_intervals = 2
    st = ViewWindowStreamer(host, window_size=4, seed=0)
    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    key = jax.random.key(0)
    vids = jnp.arange(4)
    for i in range(4):
        ds, _ = st.current()
        key, sub = jax.random.split(key)
        state, stats = step(state, ds, vids, sub)
        st.advance()
    assert np.isfinite(float(stats["loss_total"]))
