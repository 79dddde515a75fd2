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


def test_bench_floor_reseeds_from_committed_records(tmp_path):
    """Container resets wipe out/bench_floor.json; the vs_baseline ratchet
    must re-seed from the committed BENCH_r*.json driver records so the
    denominator floor never quietly drops (bench._committed_floor)."""
    import json

    import bench

    (tmp_path / "BENCH_r07.json").write_text(json.dumps(
        {"tail": 'x\n{"metric": "m", "baseline_floor_rays_per_sec": 123.5}\n'}))
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(
        {"tail": '{"baseline_floor_rays_per_sec": 99.0}'}))
    assert bench._committed_floor(str(tmp_path)) == 123.5
    # the real repo's committed records seed SOME floor; don't pin the
    # value — driver records are environment-owned and may be pruned or
    # regenerated on other setups (advisor round-4 finding).
    assert bench._committed_floor() > 0
