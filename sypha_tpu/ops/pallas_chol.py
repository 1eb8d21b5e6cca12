"""Pallas TPU kernel: batched inverse-Cholesky of small SPD matrices.

The IPM factors a [B, m, m] batch (m ~ 200-600) of equilibrated normal
matrices every iteration; XLA's cholesky/triangular_solve lower to many
small HBM-roundtripping ops.  This kernel keeps one lane tile entirely in
VMEM and runs a blocked factorization + blocked triangular inversion with
all panel/trailing updates as MXU matmuls:

  phase 1 (blocked right-looking Cholesky, block nb):
      D_k   = chol(W[k,k]) and its 8x8 inverse (unrolled scalar recursion)
      P     = W[k+nb:, k] @ Dinv_k^T                (panel, MXU)
      W'    = W[k+nb:, k+nb:] - P P^T               (trailing syrk, MXU)
  phase 2 (blocked lower-triangular inversion, reverse order):
      X[k, k]       = Dinv_k
      X[k+nb:, k]   = -X[k+nb:, k+nb:] (L[k+nb:, k] Dinv_k)

STATUS: experimental, correct in interpret mode (see tests/test_pallas_chol.py)
but NOT compiled on TPU in this environment.  Findings so far:
  * sub-128-lane iota shapes are rejected ("Invalid type") — worked around
    by building (8, 128) index tiles and slicing;
  * even minimal probes that STORE to sub-tile ref slices
    (``o_ref[:, 8:, :8] = P``) crash this environment's remote Mosaic
    compile helper with an opaque HTTP 500 (no lowering diagnostics), while
    full-block batched dot_general kernels compile fine.
The blocked-in-place algorithm is inherently sub-tile-store heavy, so the
compiled path needs either a diagnosable local Mosaic toolchain or a
restructuring to full-tile writes.  Until then
ops.linalg.block_chol_inverse (pure batched XLA GEMMs, measured at the same
throughput ballpark) remains the production factor path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 8  # factor block: one f32 sublane


def _chol8_and_inv(D):
    """Batched 8x8 Cholesky + inverse: D [T, 8, 8] -> (L, Linv), unrolled.

    Runs on the VPU; 8 sequential steps of rank-1 updates.  No scatter
    (unsupported in Pallas TPU lowering): columns accumulate via one-hot
    masks built from 2D iota.
    """
    # Mosaic rejects sub-128-lane iota shapes: build index grids at the
    # native (8, 128) tile and slice down to (8, 8)
    rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)[:, :NB]
    cols = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 1)[:, :NB]
    col_line = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[:, :NB]

    L = jnp.zeros_like(D)
    for j in range(NB):
        d = jnp.sqrt(jnp.maximum(D[:, j, j], 1e-30))
        col = D[:, :, j] / d[:, None]  # [T, 8]
        keep = (col_line >= j).astype(D.dtype)
        col = col * keep[0][None, :]
        onehot_j = (cols == j).astype(D.dtype)  # [8, 8], column j
        L = L + col[:, :, None] * onehot_j[None, :, :]
        D = D - col[:, :, None] * col[:, None, :]

    # forward substitution for Linv, column by column
    Linv = jnp.zeros_like(L)
    for j in range(NB):
        x = jnp.zeros_like(L[:, :, 0])  # [T, 8]
        for i in range(j, NB):
            rhs = 1.0 if i == j else 0.0
            acc = rhs - jnp.sum(L[:, i, :] * x, axis=-1)
            onehot_i = (col_line == i).astype(L.dtype)[0]
            x = x + (acc / L[:, i, i])[:, None] * onehot_i[None, :]
        onehot_j = (cols == j).astype(L.dtype)
        Linv = Linv + x[:, :, None] * onehot_j[None, :, :]
    return L, Linv


def _chol_inverse_kernel(m: int, M_ref, out_ref, W_ref, L_ref):
    """One lane tile: W/L are [T, m, m] f32 VMEM scratch."""
    W_ref[:] = M_ref[:]
    L_ref[:] = jnp.zeros_like(L_ref)

    nblk = m // NB
    dinvs = []
    # ---- phase 1: blocked Cholesky, W holds the shrinking trailing block
    for kb in range(nblk):
        k = kb * NB
        D = W_ref[:, pl.ds(k, NB), pl.ds(k, NB)]
        Lk, Dinv = _chol8_and_inv(D)
        dinvs.append(Dinv)
        L_ref[:, pl.ds(k, NB), pl.ds(k, NB)] = Lk
        r = m - k - NB
        if r > 0:
            panel = W_ref[:, pl.ds(k + NB, r), pl.ds(k, NB)]
            P = jax.lax.dot_general(
                panel, Dinv,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [T, r, NB] = panel @ Dinv^T
            L_ref[:, pl.ds(k + NB, r), pl.ds(k, NB)] = P
            trail = W_ref[:, pl.ds(k + NB, r), pl.ds(k + NB, r)]
            W_ref[:, pl.ds(k + NB, r), pl.ds(k + NB, r)] = trail - jax.lax.dot_general(
                P, P,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

    # ---- phase 2: blocked inversion of L into out, reverse block order
    out_ref[:] = jnp.zeros_like(out_ref)
    for kb in reversed(range(nblk)):
        k = kb * NB
        out_ref[:, pl.ds(k, NB), pl.ds(k, NB)] = dinvs[kb]
        r = m - k - NB
        if r > 0:
            LDinv = jax.lax.dot_general(
                L_ref[:, pl.ds(k + NB, r), pl.ds(k, NB)], dinvs[kb],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [T, r, NB]
            X_trail = out_ref[:, pl.ds(k + NB, r), pl.ds(k + NB, r)]
            out_ref[:, pl.ds(k + NB, r), pl.ds(k, NB)] = -jax.lax.dot_general(
                X_trail, LDinv,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def pallas_chol_inverse(
    M: jnp.ndarray, lane_tile: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """L^{-1} with M = L L^T for a batch M [B, m, m] f32, m % 8 == 0,
    B % lane_tile == 0."""
    B, m, _ = M.shape
    if m % NB:
        raise ValueError(f"m={m} must be a multiple of {NB}")
    T = lane_tile
    if B % T:
        raise ValueError(f"B={B} must be a multiple of lane_tile={T}")

    kernel = functools.partial(_chol_inverse_kernel, m)
    return pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (T, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, m, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, m, m), jnp.float32),
            pltpu.VMEM((T, m, m), jnp.float32),
        ],
        interpret=interpret,
    )(M.astype(jnp.float32))
