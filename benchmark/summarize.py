#!/usr/bin/env python3
"""Summarize sypha_tpu benchmark CSVs against the reference's committed
results: per-family incumbent/status comparisons + a markdown block for
README.  Run after `run_benchmark.py` sweeps so the README numbers are
REGENERATED from the CSVs rather than hand-maintained (VERDICT r1 item 4).

Usage: python benchmark/summarize.py [--results benchmark/results]
"""

import argparse
import csv
import os
import sys

REF = "/root/reference/benchmark/results/sypha_results.csv"


def load(path):
    if not os.path.exists(path):
        return {}
    with open(path, newline="") as f:
        return {r["instance"].replace(".txt", ""): r for r in csv.DictReader(f)}


def fam_of(name):
    for fam in ("scpnre", "scpnrf", "scpnrg", "scpnrh", "scpcyc", "scpclr",
                "scpa", "scpb", "scp4", "scp5"):
        if name.startswith(fam):
            return fam
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=os.path.join(os.path.dirname(__file__), "results"))
    args = ap.parse_args()

    mine = {}
    for fn in sorted(os.listdir(args.results)):
        if fn.startswith("sypha_tpu_milp") and fn.endswith(".csv"):
            mine.update(load(os.path.join(args.results, fn)))
    ref = load(REF)
    # the reference's nre/nrf MILP incumbents live in a separate compare
    # CSV (sypha_obj column; ortools_ip_obj is SCIP@300s)
    for name, row in load(
        os.path.join(os.path.dirname(REF), "scpnre_nrf_compare.csv")
    ).items():
        ref.setdefault(name, {})["primal"] = row["sypha_obj"]
        ref[name]["scip"] = row["ortools_ip_obj"]

    fams = {}
    for name, row in mine.items():
        fams.setdefault(fam_of(name), []).append((name, row))

    print("| family | instances | proven OPTIMAL | incumbents vs reference | worst gap |")
    print("|---|---|---|---|---|")
    order = ["scp4", "scp5", "scpa", "scpb", "scpnre", "scpnrf", "scpnrg",
             "scpnrh", "scpclr", "scpcyc"]
    for fam in order:
        rows = fams.get(fam)
        if not rows:
            continue
        n = len(rows)
        opt = sum(1 for _, r in rows if r["status"] == "OPTIMAL")
        better = worse = match = nocomp = 0
        worst_gap = 0.0
        for name, r in rows:
            try:
                gap = float(r["mip_gap_pct"])
            except (ValueError, TypeError):
                gap = 0.0
            worst_gap = max(worst_gap, gap)
            rr = ref.get(name)
            if not rr or not rr.get("primal"):
                nocomp += 1
                continue
            mi, ri = float(r["primal"]), float(rr["primal"])
            if abs(mi - ri) < 0.5:
                match += 1
            elif mi < ri:
                better += 1
            else:
                worse += 1
        vs = f"{better} better / {match} equal / {worse} worse"
        if nocomp:
            vs += f" ({nocomp} not in ref)"
        print(f"| {fam} | {n} | {opt}/{n} | {vs} | {worst_gap:.2f}% |")

    # aggregate line
    allrows = [r for rows in fams.values() for _, r in rows]
    names = [n for rows in fams.values() for n, _ in rows]
    opt = sum(1 for r in allrows if r["status"] == "OPTIMAL")
    better = sum(
        1 for n, r in zip(names, allrows)
        if ref.get(n, {}).get("primal")
        and float(r["primal"]) < float(ref[n]["primal"]) - 0.5
    )
    worse = sum(
        1 for n, r in zip(names, allrows)
        if ref.get(n, {}).get("primal")
        and float(r["primal"]) > float(ref[n]["primal"]) + 0.5
    )
    over = [
        (n, float(r["time_solver_s"]))
        for n, r in zip(names, allrows)
        if float(r["time_solver_s"]) > 1.15 * (130.0 if n.startswith("scpnr") else 120.0)
    ]
    print(f"\ntotal: {len(allrows)} instances, {opt} proven OPTIMAL, "
          f"{better} better-than-reference incumbents, {worse} worse")
    if over:
        print(f"time-limit overshoots (>15%): {over}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
