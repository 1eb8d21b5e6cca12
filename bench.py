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
    # solver: 1.70 s, benchmark/results/scp4_sypha_results.csv:2).
    # The axon tunnel adds noisy per-dispatch latency, so sample several
    # times and report min + median (one r3 sample read 0.064 s where the
    # r2 sample read 0.056 s — within the tunnel's run-to-run spread).
    single = jax.jit(lambda g: mehrotra_solve_shared(g, opts))
    one = make_shared_batch(pad_lp(models[0], m_pad=mp, n_pad=np_), 1)
    jax.device_get(single(one).status)  # compile + warm
    lat = []
    for _ in range(7):
        t1 = time.perf_counter()
        st1 = single(one)
        jax.device_get(st1.status)
        lat.append(time.perf_counter() - t1)
    lat.sort()
    single_latency = lat[len(lat) // 2]  # median
    single_latency_min = lat[0]

    # Roofline: achieved FLOP/s from the measured per-lane iteration
    # counts.  Per IPM iteration per lane the dense-factor path does
    #   f32: Gram A D^2 A^T (2 m^2 n) + block-chol inverse (~4/3 m^3)
    #        + preconditioner applications (2 solves x ~S steps x 2x2m^2)
    #   f64: matrix-free PCG matvecs (2 solves x ~S steps x 2x(2mn))
    # with S = observed flexible-PCG steps ~= 3 (newton_tol at factor
    # strength).  f64 on this TPU is emulated at ~12x f32 cost (CLAUDE.md),
    # so the f64 term is also reported as f32-equivalent work.
    iters_total = int(np.asarray(jax.device_get(st.iterations)).sum())
    m, n = float(mp), float(np_)
    S = 3.0
    f32_per_iter = 2 * m * m * n + (4.0 / 3.0) * m**3 + 2 * S * 2 * 2 * m * m
    f64_per_iter = 2 * S * 2 * (2 * m * n)
    f32_flops = iters_total * f32_per_iter
    f64_flops = iters_total * f64_per_iter
    achieved_tflops = (f32_flops + f64_flops) / dt / 1e12
    f32_equiv_tflops = (f32_flops + 12.0 * f64_flops) / dt / 1e12

    solves_per_s = B / dt
    print(
        json.dumps(
            {
                "metric": "batched scp4x LP IPM throughput (1e-8 gap)",
                "value": round(solves_per_s, 2),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 1),
                "single_lp_latency_s": round(single_latency, 4),
                "single_lp_latency_min_s": round(single_latency_min, 4),
                "single_lp_vs_ref_1p70s": round(1.70 / single_latency, 1),
                "achieved_tflops": round(achieved_tflops, 3),
                "f32_equiv_tflops": round(f32_equiv_tflops, 3),
                # industry MFU (vs v5e-class 197 TF/s bf16 nominal) is tiny
                # because the tunnel caps effective throughput at ~0.4-1
                # TF/s; frac >= 1 of that measured ceiling says the bench
                # is COMPUTE-bound through the tunnel — the remaining
                # single-chip levers are algorithmic (fewer iterations),
                # not scheduling
                "mfu_vs_197tflops_nominal": round(achieved_tflops / 197.0, 4),
                "frac_of_measured_tunnel_ceiling": round(
                    f32_equiv_tflops / 1.0, 3
                ),
                "ipm_iters_total": iters_total,
                "flop_model": (
                    "iters x (2m^2n Gram + 4/3 m^3 factor + 12m^2 precond "
                    "[f32] + 24mn PCG matvecs [f64, ~3 steps/solve]); "
                    "f32_equiv counts emulated f64 at the measured 12x; "
                    "ceiling = measured 0.4-1 TF/s effective tunnel "
                    "throughput (CLAUDE.md), far below nominal v5e"
                ),
                "methodology": (
                    f"{G} instance groups x {lanes} replicated lanes per "
                    "group (the B&B node-window layout: one shared A per "
                    "group, lanes differ only in masks/rhs); every lane is "
                    "a full independent IPM solve to 1e-8; warm-cache, "
                    "compile excluded; latency = 1 lane of scp41 warm, "
                    "median of 7"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
