"""Mixed-precision SPD solves for the IPM normal equations.

TPU reality: f64 is software-emulated (~20x the cost of f32 for the
depth-bound factorisations), while f32 GEMMs ride the MXU.  So we factor a
Jacobi-equilibrated copy of M in f32 (with a small ridge so the factor
always exists), and recover f64 accuracy by running flexible preconditioned
CG *in f64* with the f32 factor as preconditioner.  Early IPM iterations
need 1-2 CG steps; endgame ill-conditioning costs a few more.  This is the
TPU-native counterpart of the reference's Jacobi-CG Krylov path with its
per-IPM-iteration adaptive tolerance (src/sypha_solver_krylov.cu:230-393,
src/sypha_solver.cpp:552-553) — except our preconditioner is a full
Cholesky factor, not a diagonal.

All functions are batched ([..., m, m] / [..., m]) and jit/vmap-safe.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from sypha_tpu.ops.linalg import block_chol_inverse


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpdFactor:
    """Equilibrated factor of an SPD matrix M = Dg Ms Dg.

    Ms: [..., m, m] f64 equilibrated matrix (unit-ish diagonal)
    Linv: [..., m, m] inverse Cholesky factor of Ms (+ ridge), possibly f32
    dinv: [..., m] 1/sqrt(diag M) equilibration scales (f64)
    """

    Ms: jnp.ndarray
    Linv: jnp.ndarray
    dinv: jnp.ndarray


def spd_factor(
    M: jnp.ndarray,
    factor_dtype=jnp.float32,
    ridge: float = 2e-6,
    leaf_size: int = 64,
) -> SpdFactor:
    """Equilibrate and factor M (SPD, f64)."""
    diag = jnp.diagonal(M, axis1=-2, axis2=-1)
    dinv = lax.rsqrt(jnp.maximum(diag, 1e-300))
    Ms = M * dinv[..., None, :] * dinv[..., :, None]
    m = M.shape[-1]
    Mf = Ms.astype(factor_dtype) + jnp.asarray(ridge, factor_dtype) * jnp.eye(
        m, dtype=factor_dtype
    )
    Linv = block_chol_inverse(Mf, leaf_size=leaf_size)
    return SpdFactor(Ms=Ms, Linv=Linv, dinv=dinv)


def _apply_precond(Linv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """P r = L^{-T} L^{-1} r, computed in the factor dtype, returned f64."""
    rf = r.astype(Linv.dtype)
    z = jnp.einsum("...ij,...j->...i", Linv, rf)
    z = jnp.einsum("...ji,...j->...i", Linv, z)
    return z.astype(r.dtype)


def spd_solve(
    fac: SpdFactor,
    f: jnp.ndarray,
    tol: jnp.ndarray | float = 1e-12,
    max_steps: int = 50,
) -> jnp.ndarray:
    """Solve M x = f to relative residual ``tol`` (on the equilibrated
    system) via flexible PCG in f64 preconditioned by the f32 factor.

    ``tol`` may be a traced scalar (the IPM feeds its per-iteration
    tolerance schedule).  Returns x in f64.
    """
    fs = fac.dinv * f
    norm_fs = jnp.linalg.norm(fs, axis=-1, keepdims=True)
    thresh = tol * jnp.maximum(norm_fs, 1e-300)

    Ms = fac.Ms

    def matvec(v):
        return jnp.einsum("...ij,...j->...i", Ms, v)

    x0 = _apply_precond(fac.Linv, fs)
    r0 = fs - matvec(x0)
    z0 = _apply_precond(fac.Linv, r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=-1, keepdims=True)

    def cond(carry):
        x, r, z, p, rz, r_prev, k = carry
        rnorm = jnp.linalg.norm(r, axis=-1, keepdims=True)
        return jnp.logical_and(k < max_steps, jnp.any(rnorm > thresh))

    def body(carry):
        x, r, z, p, rz, r_prev, k = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=-1, keepdims=True)
        # guard against breakdown (non-SPD rounding): freeze the lane
        ok = pAp > 0.0
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        z_new = _apply_precond(fac.Linv, r_new)
        # flexible (Polak-Ribiere) beta: robust to the inexact f32 precond
        rz_new = jnp.sum(r_new * z_new, axis=-1, keepdims=True)
        num = jnp.sum((r_new - r) * z_new, axis=-1, keepdims=True)
        beta = jnp.where(jnp.abs(rz) > 0, num / jnp.where(jnp.abs(rz) > 0, rz, 1.0), 0.0)
        p_new = z_new + beta * p
        return (x_new, r_new, z_new, p_new, rz_new, r, k + 1)

    x, r, *_ = lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, r0, jnp.asarray(0, jnp.int32))
    )
    return fac.dinv * x
