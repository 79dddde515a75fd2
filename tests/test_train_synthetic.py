"""End-to-end training slice on the synthetic fixture (SURVEY.md §4:
BASELINE config-1-style CPU-runnable integration test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.dataset import (
    batch_intervals,
    sample_ray_batch,
    train_test_split,
    view_primitives,
    view_rays,
)
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.train import make_train_state, make_train_step


def tiny_cfg():
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_image_hw = (32, 48)
    cfg.data.synthetic_num_frames = 6
    cfg.data.synthetic_num_boxes = 5
    cfg.data.n_rays = 256
    cfg.data.max_primitives = 8
    cfg.data.max_intervals = 4
    cfg.model.trunk_depth = 3
    cfg.model.trunk_width = 64
    cfg.model.color_width = 32
    cfg.model.num_classes = 6
    cfg.model.compute_dtype = "float32"
    cfg.render.n_samples = 24
    cfg.render.n_importance = 0
    cfg.render.near = 0.5
    cfg.render.far = 40.0
    cfg.render.use_primitives = True
    cfg.train.lr = 5e-3
    cfg.train.max_steps = 300
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    ds = build_synthetic_dataset(cfg, seed=0)
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    state = make_train_state(cfg, model, params)
    return cfg, ds, model, state


def test_dataset_shapes(setup):
    cfg, ds, _, _ = setup
    assert ds.images.shape == (6, 32, 48, 3)
    assert ds.images.dtype == jnp.uint8
    assert ds.prim_w2p.shape == (6, 8, 3, 4)
    assert int(ds.prim_valid.sum()) == 6 * 5
    # depth is sparse: 25% of box-hit pixels only
    frac = float((ds.depth > 0).mean())
    assert 0.01 < frac < 0.2
    # pseudo mostly agrees with gt (7% flip noise)
    agree = float((ds.pseudo == ds.gt_sem).mean())
    assert 0.88 < agree < 0.98


def test_sample_ray_batch(setup):
    cfg, ds, _, _ = setup
    view_ids = jnp.arange(6)
    batch = sample_ray_batch(jax.random.key(1), ds, view_ids, 128)
    assert batch.rays_o.shape == (128, 3)
    assert float(jnp.abs(jnp.linalg.norm(batch.rays_d, axis=-1) - 1).max()) < 1e-5
    assert batch.rgb.min() >= 0 and batch.rgb.max() <= 1
    # ray through pixel must reproduce that pixel's depth when cast at gt
    iv = batch_intervals(ds, batch, 0.5, 40.0, 4)
    has_depth = np.asarray(batch.depth) > 0
    t_in = np.asarray(iv.t_in)
    # for depth-valid box pixels the first interval entry ~= gt depth
    sel = has_depth & np.asarray(iv.mask[:, 0])
    if sel.any():
        err = np.abs(t_in[sel, 0] - np.asarray(batch.depth)[sel])
        assert np.median(err) < 0.1


def test_train_step_runs_and_descends(setup):
    cfg, ds, model, state = setup
    step = make_train_step(cfg, model, donate=False)
    view_ids = jnp.arange(6)
    key = jax.random.key(2)
    _, stats0 = step(state, ds, view_ids, key)
    s = state
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        s, stats = step(s, ds, view_ids, sub)
        losses.append(float(stats["loss_total"]))
    assert np.isfinite(losses).all()
    # loss must clearly descend on an overfit-able tiny scene
    assert np.mean(losses[-10:]) < 0.7 * np.mean(losses[:10])
    assert float(stats["psnr"]) > float(stats0["psnr"])


@pytest.fixture(scope="module")
def trained(setup):
    cfg, ds, model, state = setup
    step = make_train_step(cfg, model, donate=False)
    view_ids = jnp.arange(6)
    key = jax.random.key(3)
    s = state
    for i in range(300):
        key, sub = jax.random.split(key)
        s, stats = step(s, ds, view_ids, sub)
    return cfg, ds, model, s, stats


def test_psnr_rises_above_floor(trained):
    """Overfit and require a PSNR floor — the config-1 fixture gate."""
    cfg, ds, model, s, stats = trained
    assert float(stats["psnr"]) > 18.0, f"psnr={float(stats['psnr'])}"
    # semantics should be learning too
    assert float(stats["loss_sem2d"]) < 1.0


def test_full_image_eval_pipeline(trained):
    """Render a full view and push it through the Evaluator: PSNR, mIoU, PQ."""
    import numpy as np

    from panopticnerf_tpu.eval import make_evaluator
    from panopticnerf_tpu.ops import intersect_rays
    from panopticnerf_tpu.render import SceneBounds, render_image_rays

    cfg, ds, model, s, _ = trained
    cfg.render.ray_tile = 512
    view = 3
    o, d = view_rays(ds, view)
    prims = view_primitives(ds, view)
    iv = intersect_rays(o, d, prims, cfg.render.near, cfg.render.far, cfg.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)
    out = jax.jit(
        lambda p: render_image_rays(model, p, o, d, bounds, cfg, iv=iv)
    )(s.params)

    ev = make_evaluator(cfg)
    gt_rgb = np.asarray(ds.images[view], np.float32).reshape(-1, 3) / 255.0
    gt_sem = np.asarray(ds.gt_sem[view]).reshape(-1)
    gt_inst = np.asarray(ds.gt_inst[view]).reshape(-1)
    sem, inst = ev.evaluate(out, gt_rgb, gt_sem, gt_inst)
    res = ev.summarize()
    assert res["psnr"] > 18.0
    assert res["miou"] > 0.5, f"miou={res['miou']}, iou={res['iou_per_class']}"
    assert res["pq"] > 0.3, f"pq={res['pq']}"
    # fused instance map should reuse primitive instance ids
    pred_insts = set(np.unique(inst[inst > 0]).tolist())
    gt_insts = set(np.unique(gt_inst[gt_inst > 0]).tolist())
    assert pred_insts <= set(np.unique(np.asarray(ds.prim_inst)).tolist())
    assert len(pred_insts & gt_insts) >= 1


def test_train_test_split():
    train, test = train_test_split(16, 8)
    assert set(test) == {4, 12}
    assert len(train) == 14 and not (set(train) & set(test))


def test_synthetic_ground_plane():
    cfg = tiny_cfg()
    cfg.data.synthetic_ground = True
    ds = build_synthetic_dataset(cfg, seed=0)
    import numpy as np

    # ground primitive present (6th), class 1, instance 0 (stuff)
    assert int(ds.prim_valid[0].sum()) == 6
    assert int(ds.prim_sem[0, 5]) == 1
    assert int(ds.prim_inst[0, 5]) == 0
    # bottom rows of the image are mostly ground (class 1), not sky
    bottom = np.asarray(ds.gt_sem[0][-4:])
    assert (bottom != 0).mean() > 0.8
    # depth now dense-ish at the bottom (ground hits)
    assert float((np.asarray(ds.depth[0][-4:]) > 0).mean()) > 0.1


def test_synthetic_fisheye_end_to_end():
    """-360 path: train on mixed perspective+fisheye views and verify the
    fisheye views are actually learnable (PSNR rises on valid pixels)."""
    cfg = tiny_cfg()
    cfg.data.synthetic_fisheye = True
    cfg.data.synthetic_num_frames = 4
    cfg.data.views_per_batch = 2
    cfg.data.n_rays = 256
    ds = build_synthetic_dataset(cfg, seed=0)
    assert ds.images.shape[0] == 8            # 4 frames x (persp + fisheye)
    assert ds.cam_model.tolist() == [0, 1] * 4
    vm = np.asarray(ds.valid_mask)
    assert vm[0].all()                        # perspective fully valid
    assert not vm[1].all() and vm[1].any()    # fisheye has an FOV circle
    # fisheye GT outside the circle is ignore-labeled
    assert (np.asarray(ds.gt_sem[1])[~vm[1]] == 255).all()

    model = make_network(cfg)
    state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
    step = make_train_step(cfg, model, donate=False)
    vids = jnp.arange(8)
    key = jax.random.key(0)
    losses = []
    for _ in range(80):
        state, stats = step(state, ds, vids, key)
        losses.append(float(stats["loss_total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-20:]) < 0.6 * np.mean(losses[:20])

    # render the fisheye view and check valid-pixel PSNR beats a gray image
    from panopticnerf_tpu.eval import make_evaluator
    from panopticnerf_tpu.ops import intersect_rays
    from panopticnerf_tpu.render import SceneBounds, render_image_rays

    cfg.render.ray_tile = 512
    o, d = view_rays(ds, 1)
    iv = intersect_rays(o, d, view_primitives(ds, 1), cfg.render.near,
                        cfg.render.far, cfg.data.max_intervals)
    bounds = SceneBounds(ds.bounds_center, ds.bounds_scale)
    out = jax.jit(lambda p: render_image_rays(model, p, o, d, bounds, cfg, iv=iv))(state.params)
    ev = make_evaluator(cfg)
    gt_rgb = np.asarray(ds.images[1], np.float32).reshape(-1, 3) / 255.0
    ev.evaluate(out, gt_rgb, valid=vm[1].reshape(-1))
    res = ev.summarize()
    gray_mse = float(np.mean((gt_rgb[vm[1].reshape(-1)] - 0.5) ** 2))
    gray_psnr = -10 * np.log10(gray_mse)
    assert res["psnr"] > gray_psnr + 2, (res["psnr"], gray_psnr)
