"""The shipped pretrained artifact must stay loadable (guards against
checkpoint-format or model-topology drift breaking the in-repo demo)."""

import os

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_flagship_artifact_loads():
    from panopticnerf_tpu.config import load_config
    from panopticnerf_tpu.models import init_params, make_network
    from panopticnerf_tpu.train.checkpoint import load_network

    cfg = load_config(os.path.join(REPO, "configs", "synthetic_flagship.yaml"))
    cfg.model_dir = os.path.join(REPO, "artifacts")
    model = make_network(cfg)
    tpl = init_params(model, jax.random.key(0))
    params, step = load_network(tpl, cfg.trained_model_dir)  # strict
    assert step == 10000
    leaves = jax.tree.leaves(params)
    assert sum(x.size for x in leaves) == sum(x.size for x in jax.tree.leaves(tpl))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
