"""Pallas batched inverse-Cholesky kernel (experimental): interpret-mode
correctness against numpy.  The compiled TPU path is blocked on Mosaic
tiling of the 8x8 micro-factorization (see module docstring)."""

import numpy as np
import jax.numpy as jnp

from sypha_tpu.ops.pallas_chol import pallas_chol_inverse


def test_pallas_chol_inverse_interpret():
    rng = np.random.default_rng(0)
    B, m = 8, 64
    A = rng.random((B, m, 3 * m))
    M = (A @ A.transpose(0, 2, 1) + 3 * m * np.eye(m)).astype(np.float32)
    Linv = np.asarray(
        pallas_chol_inverse(jnp.asarray(M), lane_tile=4, interpret=True)
    )
    eye = np.einsum(
        "bij,bjk,blk->bil", Linv.astype(np.float64), M.astype(np.float64),
        Linv.astype(np.float64),
    )
    err = np.abs(eye - np.eye(m)).max()
    assert err < 1e-3, err
