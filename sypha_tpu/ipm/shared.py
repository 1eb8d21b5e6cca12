"""Shared-matrix batched Mehrotra IPM: one A, many LP lanes.

The reference solves one LP at a time, rebuilding + re-uploading the model
per B&B node (src/sypha_solver_bnb_driver.cpp:802-826 — build_branch_model
then copyModelOnDevice per node, flagged in SURVEY §3.2 as the per-node cost
a TPU rebuild must kill).  Here the whole batch of B&B nodes / replicas
shares ONE constraint matrix A resident on device; lanes differ only in

  * ``col_mask`` [B, n]: 0 where a variable is fixed by branching (or pad),
  * ``b`` [B, m]: rhs after substituting fixed-to-1 columns,
  * ``c`` [B, n]: costs (masked columns get cost 1, the pad convention),
  * ``obj_offset`` [B]: sum of costs of fixed-to-1 columns.

Branch decisions x_j=0 / x_j=1 are therefore *column masks + rhs shifts*
(no appended rows, no shape changes, no recompiles), and every A-product in
the solver is a single GEMM shared across lanes instead of B independent
GEMVs — the layout that makes emulated-f64 arithmetic affordable on TPU.

Masked columns follow the pad-column convention of core.problem.PaddedLp:
with every A-product masked, a fixed column behaves exactly like an all-zero
column, stays strictly interior, and converges to x_j ~ 0 with s_j ~ c_j = 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from sypha_tpu.config import IpmOptions
from sypha_tpu.core.problem import PaddedLp
from sypha_tpu.core.status import IpmStatus
from sypha_tpu.ipm.dense import IpmState, _factor_params
from sypha_tpu.ops.linalg import block_chol_inverse


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SharedLpBatch:
    """B standard-form LP lanes min c.x, A(mask)x = b, x >= 0 sharing one A.

    A: [m, n] f64 (shared); b: [B, m]; c: [B, n]; col_mask: [B, n] in {0,1};
    row_pad: [m] (1 on pad rows); obj_offset: [B].
    """

    A: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    col_mask: jnp.ndarray
    row_pad: jnp.ndarray
    obj_offset: jnp.ndarray

    @property
    def m_pad(self) -> int:
        return self.A.shape[-2]

    @property
    def n_pad(self) -> int:
        return self.A.shape[-1]

    @property
    def n_lanes(self) -> int:
        return self.b.shape[-2] if self.b.ndim >= 2 else 1


def make_shared_batch(lp: PaddedLp, n_lanes: int) -> SharedLpBatch:
    """Replicate a single PaddedLp into a SharedLpBatch of ``n_lanes``."""
    if lp.A.ndim != 2:
        raise ValueError("make_shared_batch expects an unbatched PaddedLp")
    B = n_lanes
    n = lp.n_pad
    mask = jnp.broadcast_to(
        (jnp.arange(n) < lp.n_real).astype(lp.A.dtype), (B, n)
    )
    return SharedLpBatch(
        A=lp.A,
        b=jnp.broadcast_to(lp.b, (B, lp.m_pad)),
        c=jnp.broadcast_to(lp.c, (B, n)),
        col_mask=mask,
        row_pad=lp.row_pad,
        obj_offset=jnp.zeros((B,), lp.A.dtype),
    )


def fix_columns(
    batch: SharedLpBatch,
    fix0: np.ndarray,
    fix1: np.ndarray,
) -> SharedLpBatch:
    """Apply per-lane branch fixings (host-side batch construction).

    fix0/fix1: [B, n] {0,1} float masks of variables fixed to 0 / 1.
    Fixing to 1 substitutes the column out: b -= A_j, offset += c_j
    (the branch row x_j >= 1 of reference build_branch_model,
    src/sypha_solver_bnb.cpp:418-490, without the row).
    """
    fix0 = jnp.asarray(fix0, batch.A.dtype)
    fix1 = jnp.asarray(fix1, batch.A.dtype)
    fixed = jnp.clip(fix0 + fix1, 0.0, 1.0)
    mask = batch.col_mask * (1.0 - fixed)
    b = batch.b - fix1 @ batch.A.T
    c = jnp.where(mask > 0, batch.c, 1.0)
    offset = batch.obj_offset + jnp.sum(fix1 * batch.c, axis=-1)
    return SharedLpBatch(
        A=batch.A, b=b, c=c, col_mask=mask, row_pad=batch.row_pad,
        obj_offset=offset,
    )


# ---------------------------------------------------------------------------
# solver internals: every A-product is a shared GEMM over the lane axis
# ---------------------------------------------------------------------------


def _shared_factor(A32, d2_eff, row_reg, ft, ridge: float, leaf_size: int):
    """f32 factor of M_b = A diag(d2_eff_b) A^T + diag(row_reg), batched.

    Same structure as ops.spd.normal_eq_factor but with A shared: Aw is the
    broadcasted [B, m, n] weighted matrix (one f32 cast of A, reused).
    """
    w = jnp.sqrt(d2_eff).astype(ft)
    Aw = A32[None, :, :] * w[:, None, :]
    M = jnp.einsum("bik,bjk->bij", Aw, Aw, preferred_element_type=ft)
    m = M.shape[-1]
    M = M + row_reg.astype(ft)[:, None, :] * jnp.eye(m, dtype=ft)
    diag = jnp.diagonal(M, axis1=-2, axis2=-1)
    dinv = lax.rsqrt(jnp.maximum(diag, jnp.asarray(1e-30, ft)))
    Ms = M * dinv[:, None, :] * dinv[:, :, None]
    Ms = Ms + jnp.asarray(ridge, ft) * jnp.eye(m, dtype=ft)
    Linv = block_chol_inverse(Ms, leaf_size=leaf_size)
    return Linv, dinv


def _precond(Linv, dinv, r):
    """P r = Dg L^-T L^-1 Dg r per lane (f32 batched GEMVs)."""
    rf = dinv * r.astype(dinv.dtype)
    z = jnp.einsum("bij,bj->bi", Linv, rf)
    z = jnp.einsum("bji,bj->bi", Linv, z)
    return (dinv * z).astype(r.dtype)


def _pcg(Linv, dinv, matvec, f, tol, max_steps: int):
    """Flexible PCG in f64, batched over lanes, matrix-free matvec."""
    norm_f = jnp.linalg.norm(f, axis=-1, keepdims=True)
    thresh = tol * jnp.maximum(norm_f, 1e-300)
    x0 = _precond(Linv, dinv, f)
    r0 = f - matvec(x0)
    z0 = _precond(Linv, dinv, r0)
    rz0 = jnp.sum(r0 * z0, axis=-1, keepdims=True)

    def cond(carry):
        x, r, z, p, rz, k = carry
        rnorm = jnp.linalg.norm(r, axis=-1, keepdims=True)
        return jnp.logical_and(k < max_steps, jnp.any(rnorm > thresh))

    def body(carry):
        x, r, z, p, rz, k = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=-1, keepdims=True)
        ok = pAp > 0.0
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        z_new = _precond(Linv, dinv, r_new)
        rz_new = jnp.sum(r_new * z_new, axis=-1, keepdims=True)
        num = jnp.sum((r_new - r) * z_new, axis=-1, keepdims=True)
        beta = jnp.where(
            jnp.abs(rz) > 0, num / jnp.where(jnp.abs(rz) > 0, rz, 1.0), 0.0
        )
        p_new = z_new + beta * p
        return (x_new, r_new, z_new, p_new, rz_new, k + 1)

    x, *_ = lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x


def shared_initial_point(batch: SharedLpBatch, opts: IpmOptions, A32):
    """Mehrotra initial point, batched over lanes of the shared matrix
    (reference src/sypha_solver_init.cpp:543-652)."""
    A, b, c, mask = batch.A, batch.b, batch.c, batch.col_mask
    ft, ridge = _factor_params(opts)
    row_reg = jnp.broadcast_to(batch.row_pad, b.shape)
    Linv, dinv = _shared_factor(
        A32, mask, row_reg, ft, ridge, opts.chol_leaf_size
    )

    def matvec(v):
        return (mask * (v @ A)) @ A.T + batch.row_pad * v

    vy = _pcg(Linv, dinv, matvec, b, 1e-12, opts.newton_max_steps)
    x = mask * (vy @ A)
    Ac = (mask * c) @ A.T
    y = _pcg(Linv, dinv, matvec, Ac, 1e-12, opts.newton_max_steps)
    s = c - mask * (y @ A)

    delta_x = jnp.maximum(-1.5 * jnp.min(x, axis=-1, keepdims=True), 0.0)
    delta_s = jnp.maximum(-1.5 * jnp.min(s, axis=-1, keepdims=True), 0.0)
    x_hat = x + delta_x
    s_hat = s + delta_s
    p = jnp.sum(x_hat * s_hat, axis=-1, keepdims=True)
    x = x_hat + 0.5 * p / jnp.sum(s_hat, axis=-1, keepdims=True)
    s = s_hat + 0.5 * p / jnp.sum(x_hat, axis=-1, keepdims=True)
    return x, y, s


def _alpha_max_batch(v, dv):
    """Per-lane max alpha in [0,1] with v + alpha dv >= 0 (masked min-reduce;
    reference alpha_max_dev, src/sypha_solver_utils.cu:139-177)."""
    ratios = jnp.where(dv < 0.0, -v / jnp.where(dv < 0.0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratios, axis=-1))


def mehrotra_solve_shared(
    batch: SharedLpBatch,
    opts: IpmOptions,
    x0=None,
    y0=None,
    s0=None,
) -> IpmState:
    """Batched Mehrotra predictor-corrector over a SharedLpBatch.

    Returns an IpmState whose leaves carry a leading lane axis.  The whole
    batch runs as ONE ``lax.while_loop``; lanes that converge freeze while
    the rest continue (per-lane status gating, as in ipm.dense).
    """
    A, b, c, mask = batch.A, batch.b, batch.c, batch.col_mask
    B, n_pad = c.shape[-2], c.shape[-1]
    ft, ridge = _factor_params(opts)
    A32 = A.astype(ft)
    row_reg = jnp.broadcast_to(batch.row_pad, b.shape)

    norm_b = 1.0 + jnp.linalg.norm(b, axis=-1)
    norm_c = 1.0 + jnp.linalg.norm(c, axis=-1)

    if x0 is None:
        x, y, s = shared_initial_point(batch, opts, A32)
    else:
        x, y, s = x0, y0, s0

    one = jnp.ones((B,), c.dtype)
    state0 = IpmState(
        x=x,
        y=y,
        s=s,
        mu=jnp.sum(x * s, axis=-1) / n_pad,
        gap=one,
        res_p=one,
        res_d=one,
        iterations=jnp.zeros((B,), jnp.int32),
        status=jnp.full((B,), IpmStatus.RUNNING, jnp.int32),
        best_gap=jnp.full((B,), jnp.inf, c.dtype),
        stall_count=jnp.zeros((B,), jnp.int32),
    )

    def cond(st: IpmState):
        return jnp.any(st.status == IpmStatus.RUNNING)

    def body(st: IpmState) -> IpmState:
        x, y, s = st.x, st.y, st.s

        r_b = (mask * x) @ A.T - b
        r_c = mask * (y @ A) + s - c
        mu = jnp.sum(x * s, axis=-1) / n_pad

        pobj = jnp.sum(c * x, axis=-1)
        dobj = jnp.sum(b * y, axis=-1)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj))
        res_p = jnp.linalg.norm(r_b, axis=-1) / norm_b
        res_d = jnp.linalg.norm(r_c, axis=-1) / norm_c

        feasible = (res_p < opts.tol_feas) & (res_d < opts.tol_feas)
        tiny_mu = mu < opts.mu_tol_hard
        converged = feasible & ((gap < opts.tol_gap) | tiny_mu)
        # mu -> 0 with a stubborn primal residual = infeasible lane (a node
        # whose fixings make the cover impossible); see ipm.dense.
        infeasible = tiny_mu & (res_p > 1e3 * opts.tol_feas)
        diverged = ~jnp.isfinite(mu) | (mu > opts.mu_max) | infeasible
        hit_max = st.iterations >= opts.max_iter

        improved = gap < st.best_gap * (1.0 - opts.gap_stall_min_improv)
        best_gap = jnp.where(improved, gap, st.best_gap)
        stall_count = jnp.where(improved, 0, st.stall_count + 1).astype(jnp.int32)
        stalled = (
            (stall_count >= opts.gap_stall_window)
            if opts.gap_stall_window > 0
            else jnp.zeros((B,), bool)
        )

        d2 = jnp.clip(x / s, opts.d2_min, opts.d2_max)
        d2_eff = d2 * mask
        Linv, dinv = _shared_factor(
            A32, d2_eff, row_reg, ft, ridge, opts.chol_leaf_size
        )

        def matvec(v):
            return (d2_eff * (v @ A)) @ A.T + batch.row_pad * v

        s_safe = jnp.maximum(s, 1e-300)

        def newton(r_xs):
            vec1 = r_xs / s_safe
            f = (mask * (vec1 - d2 * r_c)) @ A.T - r_b
            dy = _pcg(Linv, dinv, matvec, f, opts.newton_tol, opts.newton_max_steps)
            ds = -r_c - mask * (dy @ A)
            dx = -vec1 - d2 * ds
            return dx, dy, ds

        r_xs = x * s
        dxa, dya, dsa = newton(r_xs)
        a_p = _alpha_max_batch(x, dxa)[:, None]
        a_d = _alpha_max_batch(s, dsa)[:, None]
        mu_aff = jnp.sum((x + a_p * dxa) * (s + a_d * dsa), axis=-1) / n_pad
        sigma = (mu_aff / mu) ** opts.sigma_pow

        dx, dy, ds = newton(r_xs + dxa * dsa - (sigma * mu)[:, None])

        eta = (
            jnp.maximum(opts.eta, 1.0 - mu) if opts.adaptive_eta else jnp.full_like(mu, opts.eta)
        )
        alpha_p = jnp.minimum(1.0, eta * _alpha_max_batch(x, dx))[:, None]
        alpha_d = jnp.minimum(1.0, eta * _alpha_max_batch(s, ds))[:, None]

        x_new = x + alpha_p * dx
        y_new = y + alpha_d * dy
        s_new = s + alpha_d * ds

        step_ok = (
            jnp.all(jnp.isfinite(x_new), axis=-1)
            & jnp.all(jnp.isfinite(y_new), axis=-1)
            & jnp.all(jnp.isfinite(s_new), axis=-1)
        )

        new_status = jnp.where(
            converged,
            IpmStatus.CONVERGED,
            jnp.where(
                diverged | ~step_ok,
                IpmStatus.INFEASIBLE_OR_NUMERICAL,
                jnp.where(
                    hit_max,
                    IpmStatus.MAX_ITER,
                    jnp.where(stalled, IpmStatus.GAP_STALLED, IpmStatus.RUNNING),
                ),
            ),
        ).astype(jnp.int32)
        # lanes already terminated keep their status and iterate no further
        final = st.status != IpmStatus.RUNNING
        new_status = jnp.where(final, st.status, new_status)
        stepped = new_status == IpmStatus.RUNNING
        sel = stepped[:, None]

        return IpmState(
            x=jnp.where(sel, x_new, x),
            y=jnp.where(sel, y_new, y),
            s=jnp.where(sel, s_new, s),
            mu=jnp.where(final, st.mu, mu),
            gap=jnp.where(final, st.gap, gap),
            res_p=jnp.where(final, st.res_p, res_p),
            res_d=jnp.where(final, st.res_d, res_d),
            iterations=st.iterations + stepped.astype(jnp.int32),
            status=new_status,
            best_gap=best_gap,
            stall_count=stall_count,
        )

    return lax.while_loop(cond, body, state0)
