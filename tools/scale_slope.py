"""Build evidence/scale_slope.csv: per-query sf0.1 -> sf1 runtime slopes.

Inputs (produced by the round-5 scale study):
  evidence/driver_sim_sf0.1_r5.json   DRIVER_SIM_OUT at sf0.1
  evidence/driver_sim_sf1_r5.json     DRIVER_SIM_OUT at sf1 (10x rows)
  evidence/bench_sf0.1_slowest.json   SPARK_GRAFT_ONLY bench at sf0.1
  evidence/bench_sf1_slowest.json     SPARK_GRAFT_ONLY bench at sf1

Output columns: query, spark_sf0.1_sec, spark_sf1_sec, spark_ratio,
bench_sf0.1_sec, bench_sf1_sec, bench_ratio, status(sf1).

Interpretation: data grows 10x. A ratio <= ~10 is at-most-linear; fixed
per-query stage overhead (~0.3-0.5 s at sf0.1) makes small queries show
ratios well under 10. Ratios beyond a query's documented complexity
(e.g. n log n sorts slightly above 10) are flagged SUPRALINEAR for plan
review. Ratio columns are blank when either side is missing/errored.

Usage: python tools/scale_slope.py
"""

from __future__ import annotations

import csv
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EV = os.path.join(REPO, "evidence")

FLAG_RATIO = 14.0  # 10x data; >14x runtime = worth a plan review


def _load(path):
    p = os.path.join(EV, path)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def main() -> None:
    sim01 = _load("driver_sim_sf0.1_r5.json")
    sim1 = _load("driver_sim_sf1_r5.json")
    b01 = _load("bench_sf0.1_slowest.json").get("queries", {})
    b1 = _load("bench_sf1_slowest.json").get("queries", {})

    t01 = sim01.get("timings", {})
    t1 = sim1.get("timings", {})
    res1 = sim1.get("results", {})

    names = sorted(set(t01) | set(t1) | set(b01) | set(b1))
    rows = []
    n_flagged = 0
    for n in names:
        s01 = t01.get(n, {}).get("spark_sec")
        s1 = t1.get(n, {}).get("spark_sec")
        sr = round(s1 / s01, 2) if s01 and s1 and s01 > 0 else ""
        bb01 = b01.get(n) if (b01.get(n) or 0) > 0 else None
        bb1 = b1.get(n) if (b1.get(n) or 0) > 0 else None
        br = round(bb1 / bb01, 2) if bb01 and bb1 else ""
        flag = ""
        ratios = [r for r in (sr, br) if r != ""]
        if ratios and min(ratios) > FLAG_RATIO:
            flag = "SUPRALINEAR"
            n_flagged += 1
        status = res1.get(n, "")
        rows.append([n, s01 or "", s1 or "", sr, bb01 or "", bb1 or "", br,
                     flag, status])

    out = os.path.join(EV, "scale_slope.csv")
    with open(out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["query", "spark_sf0.1_sec", "spark_sf1_sec", "spark_ratio",
                    "bench_sf0.1_sec", "bench_sf1_sec", "bench_ratio",
                    "flag", "sf1_status"])
        w.writerows(rows)
    print(f"wrote {out}: {len(rows)} queries, {n_flagged} flagged > {FLAG_RATIO}x")
    for r in rows:
        if r[7]:
            print("  FLAG", r[0], "spark_ratio", r[3], "bench_ratio", r[6])


if __name__ == "__main__":
    main()
