"""Multi-host initialization (SURVEY.md SS5.8).

The reference is single-process with no communication backend; the TPU
build's comm layer is jax collectives over ICI, which need
``jax.distributed.initialize`` only when spanning hosts (DCN).  One v5e
chip trains this model whole, so multi-host is an opt-in growth path: call
:func:`ensure_initialized` before any mesh construction when the standard
cluster env (COORDINATOR_ADDRESS / num_processes / process_id, or a cloud
auto-detected equivalent) is present.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def ensure_initialized() -> bool:
    """Initialize jax.distributed iff a cluster environment is configured.

    Returns True when running multi-process (after initialization), False
    for the common single-process case.  Safe to call repeatedly.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    want = (os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if want:
        jax.distributed.initialize()
        _initialized = True
        return True
    return False


def global_mesh(n_per_host: int | None = None):
    """Data mesh over ALL processes' devices (DP across hosts rides DCN,
    within hosts rides ICI)."""
    from tpuvc.parallel.mesh import make_mesh
    ensure_initialized()
    return make_mesh(devices=jax.devices()[: n_per_host and
                     n_per_host * jax.process_count()])
