"""Headline benchmark: batched LP IPM throughput on scp4x-class instances.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}

Baseline: the reference CUDA solver solves the scp41 LP relaxation in 1.70 s
on its benchmark GPU (benchmark/results/scp4_sypha_results.csv:2), i.e.
~0.59 solves/s; the rebuild's north-star target is >100 batched IPM
solves/s/chip (BASELINE.md).  We solve all 10 scp4x LP relaxations, batch-
replicated to fill the chip, to 1e-8 relative duality gap and report
aggregate solves/s on one chip.
"""

import json
import sys
import time

REFERENCE_SOLVES_PER_S = 1.0 / 1.70  # scp41 LP, reference GPU


def main():
    import numpy as np

    from sypha_tpu import (
        IpmStatus,
        pad_lp,
        read_scp_file,
        solve_lp_batch,
        stack_lps,
    )
    from sypha_tpu.config import IpmOptions

    names = [f"scp4{i}" for i in range(1, 10)] + ["scp410"]
    models = [read_scp_file(f"/root/reference/data/{n}.txt") for n in names]

    # One bucket for the whole family.
    mp = max(m.nrows for m in models)
    np_ = max(m.nrows + m.ncols for m in models)
    mp += (-mp) % 8
    np_ += (-np_) % 128

    replicas = 10  # 10 instances x 10 = 100 lanes
    lps = [pad_lp(m, m_pad=mp, n_pad=np_) for m in models] * replicas
    batch = stack_lps(lps)
    B = len(lps)
    opts = IpmOptions()

    import jax

    # compile + warm up (device_get: block_until_ready does not actually
    # synchronise through the remote TPU tunnel)
    st = solve_lp_batch(batch, opts, as_results=False)
    jax.device_get(st.status)

    t0 = time.perf_counter()
    st = solve_lp_batch(batch, opts, as_results=False)
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

    solves_per_s = B / dt
    print(
        json.dumps(
            {
                "metric": "batched scp4x LP IPM throughput (1e-8 gap)",
                "value": round(solves_per_s, 2),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
