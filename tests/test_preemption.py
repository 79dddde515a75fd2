"""Preemption-safe recovery (SURVEY.md §5.3): a SIGTERM mid-training must
checkpoint at the next step boundary, exit cleanly, and resume exactly from
the interrupt step. Exercised end-to-end in a subprocess — the only way to
deliver a real signal to the real handler."""

import os
import re
import signal
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys

from panopticnerf_tpu.config import Config
from panopticnerf_tpu.engine import run_train

out_dir, phase = sys.argv[1], sys.argv[2]

cfg = Config()
cfg.exp_name = "preempt"
cfg.model_dir = out_dir + "/models"
cfg.record_dir = out_dir + "/records"
cfg.result_dir = out_dir + "/results"
cfg.data.dataset = "synthetic"
cfg.data.synthetic_image_hw = (16, 24)
cfg.data.synthetic_num_frames = 4
cfg.data.synthetic_num_boxes = 3
cfg.data.n_rays = 64
cfg.data.max_primitives = 4
cfg.data.max_intervals = 2
cfg.data.test_every = 3
cfg.model.trunk_depth = 2
cfg.model.trunk_width = 16
cfg.model.color_width = 8
cfg.model.num_classes = 4
cfg.model.compute_dtype = "float32"
cfg.render.n_samples = 8
cfg.render.near = 0.5
cfg.render.far = 40.0
cfg.render.use_primitives = True
cfg.train.ep_iter = 5
cfg.train.log_interval = 5
cfg.train.record_interval = 5
cfg.train.save_ep = 10**6
cfg.train.eval_ep = 10**6
cfg.train.resume = phase == "resume"

max_steps = 200000 if phase == "train" else 200
res = run_train(cfg, max_steps=max_steps)
print("DONE preempted=", res.get("preempted", False), flush=True)
"""


def _env(tmp_path):
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
        PYTHONPATH=REPO,
    )
    return env


def test_sigterm_checkpoints_and_resumes(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    out_dir = str(tmp_path / "out")

    proc = subprocess.Popen(
        [sys.executable, "-u", str(script), out_dir, "train"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(tmp_path), cwd=REPO,
    )
    lines: list[str] = []
    reader = threading.Thread(
        target=lambda: lines.extend(iter(proc.stdout.readline, "")), daemon=True
    )
    reader.start()

    # Wait until training demonstrably progresses (an epoch record line).
    deadline = time.time() + 420
    while time.time() < deadline:
        if any("epoch" in l for l in lines):
            break
        if proc.poll() is not None:
            pytest.fail("child exited before making progress:\n" + "".join(lines))
        time.sleep(0.2)
    else:
        proc.kill()
        pytest.fail("child never reported progress:\n" + "".join(lines))

    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=120)
    reader.join(timeout=10)
    out = "".join(lines)
    assert rc == 0, out
    m = re.search(r"SIGTERM received: checkpointing at step (\d+)", out)
    assert m, out
    step = int(m.group(1))
    assert step > 0
    assert "DONE preempted= True" in out

    # The checkpoint must restore: resume run starts from the interrupt step.
    res = subprocess.run(
        [sys.executable, "-u", str(script), out_dir, "resume"],
        capture_output=True, text=True, env=_env(tmp_path), cwd=REPO,
        timeout=420,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert f"resumed from step {step}" in res.stdout, res.stdout
    assert "DONE preempted= False" in res.stdout
