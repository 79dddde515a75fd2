"""Test harness: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4 'fake-cluster' strategy).

Must run before jax initializes its backends, hence env vars at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Tests run tiny problems; keep compilation deterministic and quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache: the suite is compile-dominated on CPU; repeat
# runs hit the cache and finish in a fraction of the cold time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The container's sitecustomize registers an 'axon' PJRT plugin that claims
# the real TPU tile through a relay on first backend init — a multi-minute
# handshake tests must never pay. Deregister it before any test touches jax.
try:
    import jax
    import jax._src.xla_bridge as _xb

    # sitecustomize imported jax with JAX_PLATFORMS=axon already latched into
    # jax.config; point it back at cpu and drop the axon factory. Same for
    # the cache settings (env vars were read before conftest ran).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    for _reg in ("_backend_factories",):
        getattr(_xb, _reg, {}).pop("axon", None)
except Exception:
    pass
