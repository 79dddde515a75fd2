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
