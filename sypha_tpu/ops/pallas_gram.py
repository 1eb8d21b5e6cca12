"""Pallas TPU kernel: batched Gram matrices  M_b = Aw_b @ Aw_b^T.

The per-iteration normal-matrix formation is the IPM's single largest FLOP
block (O(B m^2 n) f32).  XLA's batched einsum streams each lane's Aw from
HBM around the MXU op; this kernel pins a lane tile of Aw in VMEM and emits
the whole Gram per program, measured ~1.3-1.5x faster than the einsum at
bench scale (1280 x 208 x 1280 f32) on v5e.

Used by ipm.shared._shared_factor when ``IpmOptions.gram_backend ==
"pallas"`` (the default on TPU backends); falls back to the einsum on
backends without Mosaic (CPU tests) or when shapes exceed the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget per program: Aw tile + M tile + double buffering headroom
_VMEM_BUDGET = 12 * 1024 * 1024


def _gram_kernel(a_ref, o_ref):
    a = a_ref[:]
    o_ref[:] = jax.lax.dot_general(
        a, a, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("lane_tile",))
def pallas_gram(Aw: jnp.ndarray, lane_tile: int = 4) -> jnp.ndarray:
    """[B, m, n] f32 -> [B, m, m] f32 batched Aw @ Aw^T."""
    B, m, n = Aw.shape
    T = lane_tile
    return pl.pallas_call(
        _gram_kernel,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (T, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, m, m), jnp.float32),
    )(Aw)


def pick_lane_tile(B: int, m: int, n: int) -> int:
    """Largest supported lane tile (0 = kernel not applicable)."""
    if m % 8 or n % 128:
        return 0
    for T in (8, 4, 2, 1):
        if B % T:
            continue
        tile_bytes = T * (m * n + m * m) * 4
        if 2 * tile_bytes <= _VMEM_BUDGET:  # x2: pipeline double buffering
            return T
    return 0


def batched_gram(Aw: jnp.ndarray, backend: str = "env") -> jnp.ndarray:
    """Gram dispatch.

    Default is the XLA einsum: this environment's REMOTE Mosaic compiler is
    flaky (the identical kernel+shape compiled and ran 1.3x faster than the
    einsum at bench scale, then later recompiles of the same HLO started
    returning HTTP 500 from the compile helper), so the kernel must be
    opted into with SYPHA_TPU_GRAM=pallas where the toolchain is healthy.
    """
    import os

    B, m, n = Aw.shape
    if backend == "env":
        backend = os.environ.get("SYPHA_TPU_GRAM", "einsum")
    if backend == "pallas":
        T = pick_lane_tile(B, m, n)
        if T:
            return pallas_gram(Aw, lane_tile=T)
    return jnp.einsum("bik,bjk->bij", Aw, Aw, preferred_element_type=jnp.float32)
