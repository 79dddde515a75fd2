"""Multi-host smoke test (SURVEY.md §2.4(2)/§5.8): two real OS processes
joined by jax.distributed over a CPU 'slice' (gloo collectives), each with 2
virtual devices — a 4-device global mesh. Both processes feed IDENTICAL
replicated inputs (the documented SPMD contract in parallel/distributed.py)
and must produce identical losses and updated params, with the gradient
psum crossing the process boundary."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys

pid = int(sys.argv[1])
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb

getattr(xb, "_backend_factories", {}).pop("axon", None)

from panopticnerf_tpu.parallel import maybe_init_distributed

assert maybe_init_distributed(), "distributed init failed"
assert jax.process_count() == 2
assert jax.device_count() == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.data.synthetic import build_synthetic_dataset
from panopticnerf_tpu.models import init_params, make_network
from panopticnerf_tpu.parallel import make_parallel_train_step
from panopticnerf_tpu.train import make_train_state

cfg = Config()
cfg.data.dataset = "synthetic"
cfg.data.synthetic_image_hw = (12, 16)
cfg.data.synthetic_num_frames = 4
cfg.data.synthetic_num_boxes = 3
cfg.data.n_rays = 64
cfg.data.views_per_batch = 1
cfg.data.max_primitives = 4
cfg.data.max_intervals = 2
cfg.model.trunk_depth = 2
cfg.model.trunk_width = 16
cfg.model.color_width = 8
cfg.model.num_classes = 4
cfg.model.compute_dtype = "float32"
cfg.render.n_samples = 8
cfg.render.n_importance = 0
cfg.render.near = 0.5
cfg.render.far = 40.0
cfg.render.use_primitives = True
if os.environ.get("TEST_USE_PALLAS") == "1":
    # shard_map kernel route across the process boundary (interpret mode)
    cfg.model.use_pallas = True

mesh = Mesh(np.array(jax.devices()), ("data",))
ds = build_synthetic_dataset(cfg, seed=0)       # identical on every process
model = make_network(cfg)
state = make_train_state(cfg, model, init_params(model, jax.random.key(0)))
step = make_parallel_train_step(cfg, model, mesh, donate=False)
state2, stats = step(state, ds, jnp.arange(4), jax.random.key(0))
loss = float(stats["loss_total"])
psum = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(state2.params)))
print(f"RESULT {pid} loss={loss:.10f} paramsum={psum:.8f}", flush=True)
"""


CHILD_CLI = """
import os, sys

pid = int(sys.argv[1])
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb

getattr(xb, "_backend_factories", {}).pop("axon", None)

from panopticnerf_tpu.parallel import maybe_init_distributed

assert maybe_init_distributed(), "distributed init failed"
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.engine import run_train

root = os.environ["TEST_RUN_ROOT"]
cfg = Config()
cfg.model_dir = os.path.join(root, "trained_model")
cfg.record_dir = os.path.join(root, "record")
cfg.result_dir = os.path.join(root, "result")
cfg.data.dataset = "synthetic"
cfg.data.synthetic_image_hw = (12, 16)
cfg.data.synthetic_num_frames = 4
cfg.data.synthetic_num_boxes = 3
cfg.data.n_rays = 64
cfg.data.views_per_batch = 1
cfg.data.max_primitives = 4
cfg.data.max_intervals = 2
cfg.model.trunk_depth = 2
cfg.model.trunk_width = 16
cfg.model.color_width = 8
cfg.model.num_classes = 4
cfg.model.compute_dtype = "float32"
cfg.render.n_samples = 8
cfg.render.n_importance = 0
cfg.render.near = 0.5
cfg.render.far = 40.0
cfg.render.use_primitives = True
cfg.render.ray_tile = 64
cfg.train.ep_iter = 2
cfg.train.epochs = 2
cfg.train.log_interval = 2
cfg.train.record_interval = 2
cfg.train.save_ep = 1
cfg.train.eval_ep = 1
cfg.train.eval_views = 0
cfg.train.save_best = True
cfg.train.pretrain = ""

res = run_train(cfg)
loss = float(res["metrics"]["loss_total"])
psum = float(sum(np.abs(np.asarray(l)).sum()
                 for l in jax.tree.leaves(res["state"].params)))
print(f"RESULT {pid} loss={loss:.10f} paramsum={psum:.8f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(tmp_path, port: int, **extra) -> dict:
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES="2",
        # Per-test cache: a shared /tmp cache accumulates AOT entries from
        # other machine generations (feature-mismatch reload spam) and
        # makes child startup times diverge past gloo's 30 s context
        # deadline under load.
        JAX_COMPILATION_CACHE_DIR=str(tmp_path / "jax_cache"),
        PYTHONPATH=REPO,
        **extra,
    )
    return env


def _run_children(script, env_builder, n: int = 2):
    """Launch the n-process fake cluster; retry ONCE if gloo's fixed 30 s
    context-init deadline fires (pure infra flake: children reaching the
    first collective far apart under host load — not a product failure)."""
    for attempt in range(2):
        env = env_builder()
        procs = [
            subprocess.Popen(
                [sys.executable, "-u", str(script), str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=REPO,
            )
            for i in range(n)
        ]
        try:
            outs = [p.communicate(timeout=420)[0] for p in procs]
        finally:
            # A hung child must not leak into the rest of the session (it
            # would hold the coordinator port and starve later gloo inits).
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        if all(p.returncode == 0 for p in procs):
            return outs
        if attempt == 0 and any("DEADLINE_EXCEEDED" in o for o in outs):
            continue
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out


def _run_pair(tmp_path, use_pallas: bool):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    outs = _run_children(
        script,
        lambda: _child_env(tmp_path, _free_port(),
                           TEST_USE_PALLAS="1" if use_pallas else "0"),
    )

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, psum = line.split()
                results[pid] = (loss, psum)
    assert set(results) == {"0", "1"}, outs
    # SPMD: both processes computed the same loss and the same updated
    # params (the grad psum crossed the process boundary).
    assert results["0"] == results["1"], results
    loss0 = float(results["0"][0].split("=")[1])
    assert loss0 > 0 and loss0 < 1e4


def test_two_process_data_parallel_step(tmp_path):
    _run_pair(tmp_path, use_pallas=False)


def test_two_process_cli_train(tmp_path):
    """Full run_train (engine loop: steps, eval renders, orbax saves,
    save_best, recorder) across two real processes. Host-side artifacts
    must be written exactly once (process 0); the checkpoint save is a
    coordinated orbax write every process participates in."""
    script = tmp_path / "child_cli.py"
    script.write_text(CHILD_CLI)
    run_root = tmp_path / "run"

    def _env():
        import shutil

        shutil.rmtree(run_root, ignore_errors=True)  # clean slate per attempt
        return _child_env(tmp_path, _free_port(), TEST_RUN_ROOT=str(run_root))

    outs = _run_children(script, _env)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, psum = line.split()
                results[pid] = (loss, psum)
    assert set(results) == {"0", "1"}, outs
    assert results["0"] == results["1"], results

    # Exactly one recorder stream (process 0's), with real content.
    jsonl = run_root / "record" / "panopticnerf" / "default" / "metrics.jsonl"
    assert jsonl.exists() and jsonl.read_text().strip(), outs
    # The coordinated orbax save landed the final step.
    from panopticnerf_tpu.train.checkpoint import latest_step

    assert latest_step(str(run_root / "trained_model" / "panopticnerf"
                           / "default")) == 4
    # save_best wrote its sidecar once, beside the step root.
    import json

    meta = json.loads((run_root / "trained_model" / "panopticnerf"
                       / "default_best_metric.json").read_text())
    assert meta["step"] in (2, 4)


def test_two_process_shard_map_kernel_step(tmp_path):
    """The shard_map field-kernel route must also hold across PROCESS
    boundaries (gloo collectives carry both the in-loss psums and the
    parameter-cotangent psum of the shard_map transpose)."""
    _run_pair(tmp_path, use_pallas=True)
