import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.train import make_train_state
from panopticnerf_tpu.train.checkpoint import latest_step, load_model, load_network, save_model
from panopticnerf_tpu.train.recorder import Recorder, SmoothedValue


def _tiny_state():
    cfg = Config()
    cfg.model.trunk_depth = 2
    cfg.model.trunk_width = 16
    cfg.model.color_width = 8
    cfg.model.num_classes = 3
    cfg.render.n_importance = 0
    model = make_network(cfg)
    params = init_params(model, jax.random.key(0))
    return cfg, model, make_train_state(cfg, model, params)


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, state = _tiny_state()
    d = str(tmp_path / "ckpt")
    save_model(state, d, step=7)
    assert latest_step(d) == 7

    # restore into a template with different values
    _, _, fresh = _tiny_state()
    fresh = fresh.replace(params=jax.tree.map(lambda x: x * 0, fresh.params))
    restored, step = load_model(fresh, d)
    assert step == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_missing_dir(tmp_path):
    cfg, model, state = _tiny_state()
    restored, step = load_model(state, str(tmp_path / "nope"))
    assert step is None
    assert restored is state


def test_load_network_weights_only(tmp_path):
    cfg, model, state = _tiny_state()
    d = str(tmp_path / "ckpt")
    save_model(state, d, step=3)
    params, step = load_network(state.params, d)
    assert step == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_load_network_missing_raises(tmp_path):
    cfg, model, state = _tiny_state()
    with pytest.raises(FileNotFoundError):
        load_network(state.params, str(tmp_path / "nope2"))


def test_checkpoint_max_to_keep(tmp_path):
    cfg, model, state = _tiny_state()
    d = str(tmp_path / "ckpt")
    for s in (1, 2, 3, 4, 5):
        save_model(state, d, step=s, max_to_keep=2)
    assert latest_step(d) == 5
    kept = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    assert len(kept) <= 2


def test_smoothed_value():
    s = SmoothedValue(window=3)
    for v in (1, 2, 3, 4):
        s.update(v)
    assert s.avg == pytest.approx(3.0)       # window of (2,3,4)
    assert s.global_avg == pytest.approx(2.5)
    assert s.median == 3


def test_recorder_jsonl(tmp_path):
    r = Recorder(str(tmp_path / "rec"), use_tensorboard=False)
    r.update({"loss": 1.0, "psnr": 20.0}, step=10)
    r.update({"loss": 0.5, "psnr": 22.0}, step=20)
    r.record("train")
    line = r.log_line(1, 10, 1e-3)
    assert "loss: 0.7500" in line
    r.close()
    rows = [json.loads(l) for l in open(r.jsonl_path)]
    assert rows[-1]["step"] == 20
    assert rows[-1]["loss"] == pytest.approx(0.75)


def test_warm_start_partial_merge(tmp_path):
    """Coarse-only pretrained weights warm-start a coarse+fine model (the
    reference's `pretrain nerf` staging); fine field keeps fresh init."""
    import warnings

    import numpy as np

    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train import make_train_state
    from panopticnerf_tpu.train.checkpoint import load_network, save_model

    def cfg_with(n_imp):
        cfg = Config()
        cfg.model.trunk_depth = 2
        cfg.model.trunk_width = 16
        cfg.model.color_width = 8
        cfg.model.num_classes = 4
        cfg.render.n_importance = n_imp
        return cfg

    cfg1 = cfg_with(0)
    m1 = make_network(cfg1)
    p1 = init_params(m1, jax.random.key(1))
    s1 = make_train_state(cfg1, m1, p1)
    d = str(tmp_path / "stage1")
    save_model(s1, d, 5)

    cfg2 = cfg_with(4)  # coarse+fine
    m2 = make_network(cfg2)
    p2 = init_params(m2, jax.random.key(2))
    merged, step = load_network(p2, d, strict=False)
    assert step == 5
    # coarse field copied from the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["coarse"]["trunk_0"]["kernel"]),
        np.asarray(p1["params"]["coarse"]["trunk_0"]["kernel"]))
    # ...fine field keeps the fresh init
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["fine"]["trunk_0"]["kernel"]),
        np.asarray(p2["params"]["fine"]["trunk_0"]["kernel"]))

    # shape mismatch (resized sem head) falls back to template with warning
    cfg3 = cfg_with(0)
    cfg3.model.num_classes = 7
    m3 = make_network(cfg3)
    p3 = init_params(m3, jax.random.key(3))
    with pytest.warns(UserWarning, match="shape mismatch"):
        merged3, _ = load_network(p3, d, strict=False)
    np.testing.assert_array_equal(
        np.asarray(merged3["params"]["coarse"]["sem_out"]["kernel"]),
        np.asarray(p3["params"]["coarse"]["sem_out"]["kernel"]))

    # strict mode still fails loudly on topology mismatch
    with pytest.raises(Exception):
        load_network(p2, d, strict=True)


def test_read_paths_do_not_create_directories(tmp_path):
    """Probing loads (resume on a fresh run, `train.eval_step -1` before a
    best exists) must not litter empty checkpoint roots: an empty
    `<exp>_best/` would shadow engine._restore_for_eval's legacy-location
    fallback on the next attempt."""
    import os

    import pytest

    from panopticnerf_tpu.train.checkpoint import (
        latest_step,
        load_model,
        load_network,
    )

    missing = str(tmp_path / "never_saved")
    assert latest_step(missing) is None
    state, step = load_model(None, missing)
    assert state is None and step is None
    with pytest.raises(FileNotFoundError):
        load_network(None, missing)
    assert not os.path.exists(missing)
