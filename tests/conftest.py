"""Test harness: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4 'fake-cluster' strategy).

Must run before jax initializes its backends, hence env vars at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Tests run tiny problems; keep compilation deterministic and quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")
