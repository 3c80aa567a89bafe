"""Multi-host process-group initialization (SURVEY.md §2.4 backend row).

All cross-device communication in this framework is XLA collectives compiled
from ``psum``/sharding annotations — there is no hand-written transport.
This module is the thin entry point that joins a multi-host TPU pod slice
into one JAX process group so those collectives ride ICI within a slice and
DCN across hosts.

Usage on each host of a pod slice (before any other JAX call):

    from scfgp_tpu.parallel.multihost import init_distributed
    init_distributed()            # TPU pods: env-based auto-config
    mesh = make_mesh()            # now spans ALL hosts' devices

Single-process (this repo's test environment) is a no-op, so code written
against this API runs unchanged from laptop CPU to pod slice.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Join the multi-host process group; no-op if single-process.

    On Cloud TPU pods all three arguments auto-populate from the metadata
    environment; pass them explicitly for other clusters.  Returns a summary
    dict (process index/count, local/global device counts).
    """
    # Probe WITHOUT touching the backend: jax.process_count() would
    # initialize XLA, after which jax.distributed.initialize() refuses to
    # run (found by tests/test_multihost.py — the round-1 version of this
    # check made the join a silent no-op on every real cluster).
    already = jax.distributed.is_initialized()
    if not already and (coordinator_address is not None
                       or _looks_like_pod()):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except RuntimeError as e:
            # Backend already initialized (e.g. single-host dev loop where a
            # pod-like env var is set but JAX was touched first): stay
            # single-process rather than failing.
            import warnings
            warnings.warn(f"init_distributed: staying single-process ({e})")
    return {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def _looks_like_pod() -> bool:
    import os
    return any(k in os.environ for k in
               ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS"))


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
