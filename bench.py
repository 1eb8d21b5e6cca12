"""Headline benchmark: batched LP IPM throughput on scp4x-class instances.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}

Baseline: the reference CUDA solver solves the scp41 LP relaxation in 1.70 s
on its benchmark GPU (benchmark/results/scp4_sypha_results.csv:2), i.e.
~0.59 solves/s; the rebuild's north-star target is >100 batched IPM
solves/s/chip (BASELINE.md).  We solve all 10 scp4x LP relaxations to 1e-8
relative duality gap, replicated across lanes of the shared-matrix batched
IPM (one A per instance group, vmapped over groups — the same layout the
B&B node solver uses), and report aggregate solves/s on one chip.
"""

import json
import sys
import time

REFERENCE_SOLVES_PER_S = 1.0 / 1.70  # scp41 LP, reference GPU


def main():
    import numpy as np

    from sypha_tpu import IpmStatus, pad_lp, read_scp_file
    from sypha_tpu.config import IpmOptions
    from sypha_tpu.ipm.shared import make_shared_batch, mehrotra_solve_shared

    names = [f"scp4{i}" for i in range(1, 10)] + ["scp410"]
    models = [read_scp_file(f"/root/reference/data/{n}.txt") for n in names]

    # One bucket for the whole family.
    mp = max(m.nrows for m in models)
    np_ = max(m.nrows + m.ncols for m in models)
    mp += (-mp) % 8
    np_ += (-np_) % 128

    lanes = 128  # lanes per instance group
    batches = [
        make_shared_batch(pad_lp(m, m_pad=mp, n_pad=np_), lanes) for m in models
    ]

    import jax
    import jax.numpy as jnp

    grouped = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    G = len(batches)
    B = G * lanes
    opts = IpmOptions()

    solve = jax.jit(jax.vmap(lambda g: mehrotra_solve_shared(g, opts)))

    # compile + warm up (device_get: block_until_ready does not actually
    # synchronise through the remote TPU tunnel)
    st = solve(grouped)
    jax.device_get(st.status)

    t0 = time.perf_counter()
    st = solve(grouped)
    status = jax.device_get(st.status)
    dt = time.perf_counter() - t0

    gaps = np.asarray(jax.device_get(st.gap))
    status = np.asarray(status)
    n_conv = int((status == IpmStatus.CONVERGED).sum())
    if n_conv != B:
        print(
            f"WARNING: only {n_conv}/{B} lanes converged "
            f"(worst gap {gaps.max():.2e})",
            file=sys.stderr,
        )

    # single-LP warm latency: ONE scp41 lane start-to-1e-8 (reference CUDA
    # solver: 1.70 s, benchmark/results/scp4_sypha_results.csv:2)
    single = jax.jit(lambda g: mehrotra_solve_shared(g, opts))
    one = make_shared_batch(pad_lp(models[0], m_pad=mp, n_pad=np_), 1)
    jax.device_get(single(one).status)  # compile + warm
    t1 = time.perf_counter()
    st1 = single(one)
    jax.device_get(st1.status)
    single_latency = time.perf_counter() - t1

    solves_per_s = B / dt
    print(
        json.dumps(
            {
                "metric": "batched scp4x LP IPM throughput (1e-8 gap)",
                "value": round(solves_per_s, 2),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 1),
                "single_lp_latency_s": round(single_latency, 4),
                "single_lp_vs_ref_1p70s": round(1.70 / single_latency, 1),
                "methodology": (
                    f"{G} instance groups x {lanes} replicated lanes per "
                    "group (the B&B node-window layout: one shared A per "
                    "group, lanes differ only in masks/rhs); every lane is "
                    "a full independent IPM solve to 1e-8; warm-cache, "
                    "compile excluded; latency = 1 lane of scp41 warm"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
