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


def test_pallas_gram_interpret():
    """Gram kernel matches the einsum in interpret mode."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sypha_tpu.ops.pallas_gram import _gram_kernel, pick_lane_tile

    rng = np.random.default_rng(0)
    B, m, n = 8, 16, 128
    Aw = jnp.asarray(rng.random((B, m, n)), jnp.float32)
    T = pick_lane_tile(B, m, n)
    assert T > 0
    out = pl.pallas_call(
        _gram_kernel,
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m, m), jnp.float32),
        interpret=True,
    )(Aw)
    ref = jnp.einsum("bik,bjk->bij", Aw, Aw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
