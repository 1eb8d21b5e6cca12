"""Pallas TPU kernel: batched Gram matrices  M_b = Aw_b @ Aw_b^T.

The per-iteration normal-matrix formation is the IPM's single largest FLOP
block (O(B m^2 n) f32).  XLA's batched einsum streams each lane's Aw from
HBM around the MXU op; this kernel pins a lane tile of Aw in VMEM and emits
the whole Gram per program, measured ~1.3-1.5x faster than the einsum at
bench scale (1280 x 208 x 1280 f32) on v5e.

Used by ipm.shared._shared_factor via ``batched_gram``: on TPU backends the
kernel is tried by default behind a per-shape PROBE (a standalone compile +
run at trace time) that falls back to the einsum when the Mosaic toolchain
rejects it — this environment's REMOTE Mosaic compile helper is flaky
(identical kernel+shape compiled and ran 1.3x faster than the einsum, then
later recompiles of the same HLO returned HTTP 500).  CPU/GPU backends and
shapes exceeding the VMEM budget always use the einsum.  Override with
SYPHA_TPU_GRAM=einsum|pallas|auto.
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


# probe results per (lane_tile, m, n): True = the Mosaic kernel compiled
# and ran for this shape in this process; False = fall back to einsum
_PROBE_CACHE: dict = {}


def _pallas_probe(T: int, m: int, n: int) -> bool:
    """Standalone compile+run of the kernel at the target tile shape.

    Runs EAGERLY (host-side, also fine at trace time of an enclosing jit):
    catching a Mosaic/compile failure here keeps the kernel out of the
    enclosing executable, which could not recover from it."""
    key = (T, m, n)
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    import numpy as np

    # The axon remote-compile POOL has mixed-health workers: the identical
    # kernel+shape compiles on some and returns HTTP 500 ("Mosaic failed
    # to legalize") on others, per-call (measured 2026-08-18: same
    # pallas_call alternating OK/FAIL across fresh processes and ports).
    # Retry a couple of times so a healthy worker can answer.
    ok = False
    for _ in range(3):
        try:
            a = jnp.asarray(np.ones((T, m, n), np.float32))
            out = jax.device_get(pallas_gram(a, lane_tile=T))
            ok = bool(abs(float(out[0, 0, 0]) - n) < 1e-3)
        except Exception:  # Mosaic rejection, remote-compile 500, OOM, ...
            ok = False
        if ok:
            break
    _PROBE_CACHE[key] = ok
    return ok


def batched_gram(Aw: jnp.ndarray, backend: str = "env") -> jnp.ndarray:
    """Gram dispatch: Pallas kernel on TPU (probe-gated, einsum fallback).

    ``backend``: "env" reads SYPHA_TPU_GRAM (default "auto"); "auto" uses
    the kernel on TPU backends whenever the tile fits VMEM and the probe
    compile succeeds; "pallas" forces it (no probe); "einsum" disables.
    """
    import os

    B, m, n = Aw.shape
    if backend == "env":
        backend = os.environ.get("SYPHA_TPU_GRAM", "auto")
    if backend in ("pallas", "auto"):
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if on_tpu or backend == "pallas":
            T = pick_lane_tile(B, m, n)
            if T and (backend == "pallas" or _pallas_probe(T, m, n)):
                return pallas_gram(Aw, lane_tile=T)
    return jnp.einsum("bik,bjk->bij", Aw, Aw, preferred_element_type=jnp.float32)
