"""Multi-host slice initialization (SURVEY.md §5.8).

Single-host runs need nothing. On a multi-host TPU slice, call
`maybe_init_distributed()` once at process start: jax.distributed wires the
DCN control plane; ICI collectives inside the jitted step need no further
setup (GSPMD lowers them from the mesh shardings).

SPMD contract: `make_parallel_train_step` declares key/dataset/view_ids with
replicated in_shardings, so every process MUST feed identical values — the
on-device sampler already shards the one global batch via GSPMD. Do NOT fold
per-host state into the key passed to the parallel step (divergent values in
replicated inputs silently corrupt multi-host training).
"""

from __future__ import annotations

import os

import jax


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Uses the standard env contract (JAX_COORDINATOR_ADDRESS / TPU runtime
    auto-detect). Returns True if a multi-process runtime was initialized.
    """
    from jax._src import distributed as _dist

    # NOTE: do not probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() hard-errors.
    if _dist.global_state.client is not None:
        return jax.process_count() > 1  # already initialized by the runtime
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        if (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu"):
            # CPU slices (fake-cluster tests, CPU fallbacks) need an
            # explicit cross-process collectives backend; TPU uses ICI.
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        return jax.process_count() > 1
    return False
