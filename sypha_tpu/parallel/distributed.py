"""Multi-host coordination for the distributed B&B.

The reference keeps the cross-worker state (incumbent objective, global
dual bound, stop flag) in plain host variables of its single process
(src/sypha_solver_bnb_driver.cpp:256-261, :1048-1079 — SURVEY §2.3 item 4).
Across hosts those become the ONLY DCN traffic: scalar all-reduces on a
cadence.  Design per SURVEY §5: `jax.distributed` for bring-up, each host
runs its own frontier + node-window solves on its local chips, and every
``sync()`` pools

  * the global incumbent objective (min over hosts),
  * the global dual bound (min over hosts' frontier bounds),
  * a stop flag (any host requesting stop stops everyone).

Single-process runs degrade to a no-op pool so the B&B driver can call
``sync()`` unconditionally.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Bring up the jax.distributed runtime (multi-host).  Returns the
    process count (1 when unconfigured — single-host mode)."""
    if coordinator_address is None:
        return jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


@dataclass
class PooledBounds:
    incumbent: float
    dual_bound: float
    stop: bool


class BoundPool:
    """Scalar bound pooling across hosts.

    Uses a process-spanning all-reduce over jax.distributed when more than
    one process is attached; otherwise a no-op passthrough.  Pool calls are
    meant for a cadence (e.g. every B&B batch round), not per node — the
    scalars are tiny but each sync is a DCN barrier.
    """

    def __init__(self):
        self.n_processes = jax.process_count()

    def sync(self, incumbent: float, dual_bound: float, stop: bool) -> PooledBounds:
        if self.n_processes <= 1:
            return PooledBounds(incumbent, dual_bound, stop)
        # all-reduce three scalars across processes via a global device array
        vals = jnp.asarray(
            [incumbent, dual_bound, 1.0 if stop else 0.0], jnp.float64
        )
        from jax.experimental import multihost_utils

        allvals = multihost_utils.process_allgather(vals)  # [P, 3]
        return PooledBounds(
            incumbent=float(np.min(allvals[:, 0])),
            dual_bound=float(np.min(allvals[:, 1])),
            stop=bool(np.any(allvals[:, 2] > 0.5)),
        )
