"""Multi-chip execution: shard the batch of LPs over a device mesh.

The reference is strictly single-GPU (SURVEY §2.3); its B&B frontier window
(DeviceNodeWindow, src/sypha_solver_bnb.cpp:12-97) stages node LPs on device
but solves them one at a time.  Here the batch axis is real parallelism:
``shard_map`` places contiguous lanes on each chip, every chip runs the same
jitted vmapped Mehrotra solve on its shard, and only *scalar statistics*
(pooled bound minima/maxima, convergence counts — the state the reference
keeps in host variables, src/sypha_solver_bnb_driver.cpp:256-261) cross the
ICI via psum/pmin.  KKT solves never leave the chip.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sypha_tpu.config import IpmOptions
from sypha_tpu.core.problem import PaddedLp
from sypha_tpu.core.status import IpmStatus
from sypha_tpu.ipm.dense import mehrotra_solve


BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, axis: str = BATCH_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(lp: PaddedLp, mesh: Mesh) -> PaddedLp:
    """Place a stacked batch with its leading axis sharded over the mesh."""
    spec = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), lp)


def pooled_stats(st, axis: str = BATCH_AXIS):
    """Cross-chip scalar pooling (inside shard_map): the only ICI traffic.

    Returns (global min dual bound proxy, global max iterations,
    global converged count) — mirrors the host variables the reference's
    B&B shares between nodes (incumbent, global dual bound, stop flag).
    """
    local_converged = jnp.sum((st.status == IpmStatus.CONVERGED).astype(jnp.int32))
    converged = jax.lax.psum(local_converged, axis)
    max_iters = jax.lax.pmax(jnp.max(st.iterations), axis)
    worst_gap = jax.lax.pmax(jnp.max(st.gap), axis)
    return worst_gap, max_iters, converged


def solve_lp_batch_sharded(
    lp: PaddedLp,
    opts: Optional[IpmOptions] = None,
    mesh: Optional[Mesh] = None,
):
    """Solve a sharded batch of LPs: per-chip vmapped solves + psum'd stats.

    Returns (batched IpmState with batch axis sharded, (worst_gap,
    max_iters, n_converged) replicated scalars).
    """
    opts = opts or IpmOptions()
    mesh = mesh or make_mesh()

    def per_chip(lp_shard: PaddedLp):
        st = jax.vmap(lambda p: mehrotra_solve(p, opts))(lp_shard)
        stats = pooled_stats(st)
        return st, stats

    # check_vma=False: the while_loop carry mixes lane-varying iterates with
    # scalars initialised from constants; the varying-axis checker cannot
    # unify them even though the program is correct.
    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS),),
        out_specs=(P(BATCH_AXIS), (P(), P(), P())),
        check_vma=False,
    )
    return jax.jit(fn)(lp)
