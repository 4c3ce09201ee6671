"""Multi-host (DCN) runtime: process bootstrap + per-host slide sharding.

The reference is strictly single-process / single-GPU
(``reference DigiPathAI/Segmentation.py:62``; SURVEY.md §2.4 "collective
communication backend: none").  The TPU rebuild's multi-host story has two
layers:

1. **Across slides (this module):** a slide sweep is embarrassingly parallel,
   so each host segments ``slides[process_index::process_count]`` with its
   own local chips (grid-DP over ICI via ``parallel.inference``).  The only
   DCN traffic is the ``jax.distributed`` control plane plus an optional
   completion barrier — by design: per SURVEY.md §5 the stitched maps are
   written host-locally, and shipping gigapixel maps over DCN would be
   pure overhead.
2. **Within a step (parallel/mesh.py):** the training/tile steps shard over
   an explicit ``Mesh`` whose axes may span hosts; XLA GSPMD inserts the
   DCN collectives.  ``__graft_entry__.dryrun_multichip`` exercises that
   path on a fake topology.

Bootstrap (any one of):
  * env: ``DPAI_COORDINATOR=host:port DPAI_NUM_PROCESSES=N DPAI_PROCESS_ID=i``
  * args to :func:`initialize`
  * TPU pod metadata (``jax.distributed.initialize()`` with no args)
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Bring up the JAX multi-process runtime (idempotent).

    Arguments default to ``DPAI_COORDINATOR`` / ``DPAI_NUM_PROCESSES`` /
    ``DPAI_PROCESS_ID``; with none present on a TPU pod slice,
    ``jax.distributed.initialize()`` autodetects from pod metadata.  A plain
    single-host run (no env, no args, no pod) is a no-op.
    """
    global _initialized
    if _initialized:
        return
    import jax

    coordinator = coordinator or os.environ.get("DPAI_COORDINATOR")
    if num_processes is None and os.environ.get("DPAI_NUM_PROCESSES"):
        num_processes = int(os.environ["DPAI_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DPAI_PROCESS_ID"):
        process_id = int(os.environ["DPAI_PROCESS_ID"])

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=num_processes,
            process_id=process_id, local_device_ids=local_device_ids)
        _initialized = True
        return
    # No explicit coordinator: initialize only when pod metadata can supply
    # one (TPU pod slices); otherwise stay single-process.
    if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        _initialized = True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def shard_slides(slides: Sequence[str]) -> List[str]:
    """This host's share of a slide sweep (deterministic round-robin)."""
    return list(slides)[process_index()::max(1, process_count())]


def barrier(name: str = "dpai_barrier", timeout_ms: int = 3_600_000) -> None:
    """Block until every process reaches the barrier; no-op single-process.

    Prefers the coordination-service barrier (control plane, hour-scale
    timeout) over a device collective: hosts in a slide sweep can be minutes
    apart, far beyond the CPU/gloo collective deadline, and a barrier must
    absorb that skew so that any *following* collectives start aligned.
    """
    import jax

    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed  # coordination client (no device op)

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
            return
    except (ImportError, AttributeError):
        pass
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_hosts_total(value: float) -> float:
    """Sum a host-local scalar over all processes (e.g. slide counts,
    seconds) via one tiny DCN all-reduce; identity single-process."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(jnp.float32(value))
    return float(out.sum())
