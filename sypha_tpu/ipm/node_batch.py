"""Batched B&B node LP solves with on-device branch-row construction.

The reference rebuilds the CSR on the host and re-uploads the whole model
for every node (src/sypha_solver_bnb_driver.cpp:802-831 — flagged in SURVEY
§3.2 as a per-node cost the TPU rebuild must kill).  Here the padded base LP
lives on device once per bucket; a node is described by three small arrays
(branch vars, signs, count) and the branch rows are scattered into the
padded row budget inside jit.  A whole frontier window solves as one
vmapped program.

Branch-row encoding (reference build_branch_model,
src/sypha_solver_bnb.cpp:418-490): fixing x_j = v appends the standard-form
row  (v==0 ? -1 : +1) * x_j - slack = v, with a fresh surplus column.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sypha_tpu.config import IpmOptions
from sypha_tpu.core.problem import PaddedLp
from sypha_tpu.ipm.dense import mehrotra_solve


def build_node_lp(
    base: PaddedLp,
    branch_vars: jnp.ndarray,  # [R] int32 structural column per branch row
    branch_signs: jnp.ndarray,  # [R] f64: -1 (fix to 0) or +1 (fix to 1)
    n_branch: jnp.ndarray,  # scalar int32: how many branch rows are live
) -> PaddedLp:
    """Scatter a node's branch rows into the padded base LP (jit-safe)."""
    R = branch_vars.shape[0]
    m0 = base.m_real  # live base rows (covering + global cuts)
    n0 = base.n_real  # live base columns (structural + base surplus)
    n_pad = base.c.shape[-1]

    col_iota = jnp.arange(n_pad, dtype=jnp.int32)
    A = base.A
    b = base.b
    c = base.c
    row_pad = base.row_pad

    for i in range(R):
        live = i < n_branch
        var = branch_vars[i]
        sign = branch_signs[i]
        slack = n0 + i
        row = jnp.where(col_iota == var, sign, 0.0) + jnp.where(
            col_iota == slack, -1.0, 0.0
        )
        rhs_i = jnp.maximum(sign, 0.0)  # fix-to-1 -> 1, fix-to-0 -> 0
        r = m0 + i
        A = A.at[r, :].set(jnp.where(live, row, A[r, :]))
        b = b.at[r].set(jnp.where(live, rhs_i, b[r]))
        row_pad = row_pad.at[r].set(jnp.where(live, 0.0, row_pad[r]))
        c = c.at[slack].set(jnp.where(live, 0.0, c[slack]))

    return PaddedLp(
        A=A,
        b=b,
        c=c,
        row_pad=row_pad,
        m_real=m0 + n_branch,
        n_real=n0 + n_branch,
        n_struct=base.n_struct,
    )


@partial(jax.jit, static_argnames=("opts",))
def solve_node_batch(
    base: PaddedLp,
    branch_vars: jnp.ndarray,  # [B, R]
    branch_signs: jnp.ndarray,  # [B, R]
    n_branch: jnp.ndarray,  # [B]
    opts: IpmOptions,
):
    """Solve one batch of B&B node LPs; returns per-lane summaries plus the
    full batched state (device-resident).

    The base LP is shared (broadcast) across lanes; only the [B, R] branch
    specs differ.
    """

    def one(vars_i, signs_i, k_i):
        lp = build_node_lp(base, vars_i, signs_i, k_i)
        st = mehrotra_solve(lp, opts)
        # LP-level objectives (pad rows carry b=0 and y=0, pad columns carry
        # x ~ 0, so the full dot products are the live objectives)
        pobj = jnp.dot(lp.c, st.x)
        dobj = jnp.dot(lp.b, st.y)
        return st, pobj, dobj

    st, pobj, dobj = jax.vmap(one)(branch_vars, branch_signs, n_branch)
    return st, pobj, dobj
