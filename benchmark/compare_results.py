#!/usr/bin/env python3
"""Compare sypha_tpu results against reference solver results (either the
original sypha's committed CSVs or OR-Tools CSVs) — counterpart of the
reference's benchmark/compare_results.py with its MATCH / SYPHA+ / REF+
verdicts (:74-101).

Usage:
  python benchmark/compare_results.py results/sypha_tpu_milp_results.csv \
      /root/reference/benchmark/results/sypha_results.csv
"""

import csv
import sys


def load(path, key="instance"):
    with open(path, newline="") as f:
        return {row[key].replace(".txt", ""): row for row in csv.DictReader(f)}


def main(mine_path, ref_path):
    mine = load(mine_path)
    ref = load(ref_path)
    common = sorted(set(mine) & set(ref))
    if not common:
        print("no common instances")
        return 1

    matches = better = worse = 0
    t_mine = t_ref = 0.0
    hdr = (
        f"{'instance':<14} {'ref_inc':>9} {'ref_time':>9} "
        f"{'tpu_inc':>9} {'tpu_gap':>9} {'tpu_time':>9} {'verdict':>9}"
    )
    print(hdr)
    print("-" * len(hdr))
    for name in common:
        m, r = mine[name], ref[name]
        try:
            # 'primal' is the final MILP objective in both schemas (the
            # reference's 'incumbent' column holds its FIRST incumbent)
            mi = float(m.get("primal") or m.get("incumbent"))
            ri = float(r.get("primal") or r.get("incumbent"))
        except (TypeError, ValueError):
            continue
        if abs(mi - ri) < 0.5:
            verdict = "MATCH"
            matches += 1
        elif mi < ri:
            verdict = "TPU+"
            better += 1
        else:
            verdict = "REF+"
            worse += 1
        tm = float(m.get("time_total_s") or 0.0)
        tr = float(r.get("time_total_s") or 0.0)
        t_mine += tm
        t_ref += tr
        gap = m.get("mip_gap_pct", "")
        print(
            f"{name:<14} {ri:>9.0f} {tr:>8.1f}s {mi:>9.0f} "
            f"{(gap + '%') if gap else 'n/a':>9} {tm:>8.1f}s {verdict:>9}"
        )
    total = matches + better + worse
    print("-" * len(hdr))
    print(f"\nSummary ({total} comparable instances):")
    print(f"  Exact match: {matches}/{total}")
    print(f"  TPU better:  {better}/{total}")
    print(f"  Ref better:  {worse}/{total}")
    print(f"  Total time:  tpu {t_mine:.1f}s vs ref {t_ref:.1f}s")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
