#!/usr/bin/env python3
"""LP parity checker — counterpart of the reference's
benchmark/test_cuda_solver.py (:142-153): solve LP relaxations and compare
primal/dual against the reference implementation's golden values at
0.1% relative / 0.01 absolute tolerance.  Uses the golden tables (the
reference's own committed numbers) so no OR-Tools install is needed; pass
--scipy to cross-check against scipy.optimize.linprog (HiGHS) as the
independent oracle instead.

Usage: python benchmark/lp_parity.py [--families scp4,scp5] [--scipy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA_DIR = os.environ.get("SYPHA_DATA_DIR", "/root/reference/data")
REL_TOL = 0.001  # 0.1% (reference test_cuda_solver.py)
ABS_TOL = 0.01


def scipy_lp(model):
    import numpy as np
    from scipy.optimize import linprog

    A = model.dense_matrix()
    res = linprog(
        model.costs,
        A_ub=-A,
        b_ub=-np.ones(model.nrows),
        bounds=[(0, None)] * model.ncols,
        method="highs",
    )
    return res.fun


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="scp4,scp5")
    ap.add_argument("--scipy", action="store_true", help="use scipy as oracle")
    args = ap.parse_args()

    from sypha_tpu import pad_lp, read_scp_file, solve_lp
    from sypha_tpu.config import IpmOptions
    from sypha_tpu.core.status import IpmStatus
    from sypha_tpu.testing import GOLDEN_LP

    from benchmark.run_benchmark import FAMILIES

    failures = 0
    checked = 0
    for fam in args.families.split(","):
        for name in FAMILIES.get(fam.strip(), []):
            path = os.path.join(DATA_DIR, f"{name}.txt")
            if not os.path.exists(path):
                continue
            model = read_scp_file(path)
            res = solve_lp(pad_lp(model), IpmOptions())
            ref = scipy_lp(model) if args.scipy else GOLDEN_LP.get(name)
            if ref is None:
                continue
            checked += 1
            ok_status = res.status == IpmStatus.CONVERGED
            tol = max(ABS_TOL, REL_TOL * abs(ref))
            ok_p = abs(res.primal_objective - ref) <= tol
            ok_d = abs(res.dual_objective - ref) <= tol
            verdict = "PASS" if (ok_status and ok_p and ok_d) else "FAIL"
            if verdict == "FAIL":
                failures += 1
            print(
                f"{name:<10} ref={ref:>14.6f} primal={res.primal_objective:>14.6f} "
                f"dual={res.dual_objective:>14.6f} iters={res.iterations:>3} {verdict}"
            )
    print(f"\n{checked - failures}/{checked} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
