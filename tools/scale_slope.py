"""Build evidence/scale_slope.csv: per-query sf0.1 -> sf1 (-> sf10) slopes.

Inputs (produced by the round-5/6 scale studies):
  evidence/driver_sim_sf0.1_r5.json        DRIVER_SIM_OUT at sf0.1
  evidence/driver_sim_sf1_r5.json          DRIVER_SIM_OUT at sf1 (10x rows)
  evidence/driver_sim_sf10_money_r6.json   DRIVER_SIM_OUT at sf10 (100x rows,
                                           money-query subset — round 6)
  evidence/bench_sf0.1_slowest.json        SPARK_GRAFT_ONLY bench at sf0.1
  evidence/bench_sf1_slowest.json          SPARK_GRAFT_ONLY bench at sf1
  evidence/bench_sf10_slowest.json         SPARK_GRAFT_ONLY bench at sf10

Output columns: query, spark seconds at each SF with decade ratios,
bench seconds at each SF with decade ratios, flag, statuses.

REGIME DISCIPLINE (round 9+): cold solo-process timings run 2-3x warm
full-registry timings, so a ratio must never divide across regimes. The
sf0.1/sf1/sf10 columns are warm full-registry runs and their ratios are
warm/warm; the sf100 column is cold solo runs and its ratio divides by
the cold solo sf10 re-measures (spark_sf10_cold_sec), recorded separately
so the CSV itself shows which regime every ratio used.

Interpretation: each decade grows the data 10x. A per-decade ratio <= ~10
is at-most-linear; fixed per-query stage overhead (~0.3-0.5 s at sf0.1)
makes small queries show ratios well under 10. Ratios beyond a query's
documented complexity are flagged SUPRALINEAR for plan review. Ratio
columns are blank when either side is missing/errored.

Usage: python tools/scale_slope.py
"""

from __future__ import annotations

import csv
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EV = os.path.join(REPO, "evidence")

FLAG_RATIO = 14.0  # 10x data; >14x runtime = worth a plan review


def _load(path, required=True):
    """Load a named evidence file; WARN LOUDLY when a named file is absent
    (a silent {} made committed CSVs claim columns their inputs never had —
    round-7 advice). ``required=False`` is for _load_latest's probing."""
    p = os.path.join(EV, path)
    if not os.path.exists(p):
        if required:
            print(f"scale_slope: WARNING missing evidence file {path} — "
                  "its columns will be blank", file=sys.stderr)
        return {}
    with open(p) as fh:
        return json.load(fh)


def _load_latest(*names):
    """First existing file wins — newest round first. Warns only when NONE
    of the candidates exist."""
    for n in names:
        d = _load(n, required=False)
        if d:
            return d
    print(f"scale_slope: WARNING none of {names} exist — columns blank",
          file=sys.stderr)
    return {}


def main() -> None:
    # Containers differ uniformly in speed across rounds (~1.25x r6->r7,
    # BASELINE.md), so every ratio column must divide SAME-container
    # numbers: `python tools/scale_slope.py r7` builds scale_slope_r7.csv
    # purely from round-7-container runs; the default keeps the round-6
    # CSV reproducible from its own records.
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    sim10_cold = {}
    if mode == "r9":
        # Round-9 regime discipline (round-8 verdict "what's wrong" #1):
        # every ratio divides SAME-REGIME numbers. sf0.1/sf1/sf10 are warm
        # full-registry runs; sf100 runs are cold solo processes, so their
        # decade ratio divides by the COLD solo sf10 re-measures in
        # driver_sim_sf10_cold_r9.json — never by a warm full-run cell.
        # The CSV carries both sf10 columns so the regime of every ratio
        # is visible in the record itself.
        sim01 = _load("driver_sim_sf0.1_r9.json")
        sim1 = _load("driver_sim_sf1_r9.json")
        sim10 = _load("driver_sim_sf10_full_r9.json")
        sim10_cold = _load("driver_sim_sf10_cold_r9.json", required=False)
        sim100 = _load("driver_sim_sf100_r9.json", required=False)
        b01 = _load_latest("bench_sf0.1_r9b.json", "bench_sf0.1_r9.json").get(
            "queries", {}
        )
        b1 = {}   # no same-container sf1 bench: column blank, not mixed
        b10 = {}  # no same-container sf10 bench: column blank, not mixed
    elif mode == "r8":
        sim01 = _load("driver_sim_sf0.1_r8.json")
        sim1 = _load("driver_sim_sf1_r8.json")
        sim10 = _load("driver_sim_sf10_r8.json")
        # round 8 re-ran sf100 only for the replanned tail (q18, bloom,
        # multi, graph_degree) — other queries' sf100 columns stay blank
        # rather than mixing the r7 container's numbers into r8 ratios
        sim100 = _load("driver_sim_sf100_tail_r8.json")
        # four queries hit one-off stalls in the full sf1 run (trivial
        # single-stage scans reading 10-14 s); their SOLO re-measures
        # (driver_sim_sf1_flags_r8.json: 2.5-5 s, hash-MATCH) overlay the
        # stalled timings — statuses keep the full-run values
        flags = _load("driver_sim_sf1_flags_r8.json", required=False)
        for q, t in flags.get("timings", {}).items():
            if q in sim1.get("timings", {}):
                sim1["timings"][q] = t
        b01 = _load_latest("bench_sf0.1_r8b.json", "bench_sf0.1_r8.json").get(
            "queries", {}
        )
        b1 = {}  # no same-container sf1 bench this round: column blank
        b10 = {}  # no same-container sf10 bench this round: column blank
    elif mode == "r7":
        sim01 = _load("driver_sim_sf0.1_r7.json")
        sim1 = _load_latest("driver_sim_sf1_r7b.json", "driver_sim_sf1_r7.json")
        sim10 = _load("driver_sim_sf10_money_r7.json")
        sim100 = _load_latest(
            "driver_sim_sf100_money_r7.json", "driver_sim_sf100_q89_r7.json"
        )
        # bench columns come from the SOLO full-registry runs (best-of-2,
        # uncontended) — the r7 sim timings were recorded while pytest ran
        # concurrently, so only their hash statuses are load-bearing
        b01 = _load_latest("bench_sf0.1_r7b.json", "bench_sf0.1_r7.json").get(
            "queries", {}
        )
        b1 = _load("bench_sf1_full_r7.json").get("queries", {})
        # round 7 recorded no same-container sf10 bench; blank, not silent
        b10 = {}
    else:
        sim01 = _load_latest("driver_sim_sf0.1_r6f.json", "driver_sim_sf0.1_r6.json", "driver_sim_sf0.1_r5.json")
        sim1 = _load_latest("driver_sim_sf1_r6f.json", "driver_sim_sf1_r6.json", "driver_sim_sf1_r5.json")
        sim10 = _load("driver_sim_sf10_money_r6.json")
        sim100 = _load("driver_sim_sf100_money_r6.json")
        b01 = _load("bench_sf0.1_slowest.json").get("queries", {})
        b1 = _load("bench_sf1_slowest.json").get("queries", {})
        b10 = _load("bench_sf10_slowest.json").get("queries", {})

    t01 = sim01.get("timings", {})
    t1 = sim1.get("timings", {})
    t10 = sim10.get("timings", {})
    t10c = sim10_cold.get("timings", {})
    t100 = sim100.get("timings", {})
    res1 = sim1.get("results", {})
    res10 = sim10.get("results", {})
    res100 = sim100.get("results", {})

    def ratio(num, den):
        return round(num / den, 2) if num and den and den > 0 else ""

    names = sorted(
        set(t01) | set(t1) | set(t10) | set(t100) | set(b01) | set(b1) | set(b10)
    )
    rows = []
    n_flagged = 0
    for n in names:
        s01 = t01.get(n, {}).get("spark_sec")
        s1 = t1.get(n, {}).get("spark_sec")
        s10 = t10.get(n, {}).get("spark_sec")
        s10c = t10c.get(n, {}).get("spark_sec")
        s100 = t100.get(n, {}).get("spark_sec")
        sr = ratio(s1, s01)
        sr10 = ratio(s10, s1)
        # cold sf100 numerators divide by cold solo sf10 denominators when
        # the round recorded them (r9+); legacy modes have no cold sf10
        # re-measures, so their sf100 ratio falls back to the mixed-regime
        # division (conservative: warm denominators only overstate).
        sr100 = ratio(s100, s10c) if t10c else ratio(s100, s10)
        bb01 = b01.get(n) if (b01.get(n) or 0) > 0 else None
        bb1 = b1.get(n) if (b1.get(n) or 0) > 0 else None
        bb10 = b10.get(n) if (b10.get(n) or 0) > 0 else None
        br = ratio(bb1, bb01)
        br10 = ratio(bb10, bb1)
        flag = ""
        # flag on the WORST per-decade ratio any evidence source shows,
        # provided at least one source is clean — min() keeps noise from a
        # single contended run from flagging, per decade independently
        for decade in ((sr, br), (sr10, br10), ((sr100,) if sr100 else ())):
            ratios = [r for r in decade if r != ""]
            if ratios and min(ratios) > FLAG_RATIO:
                flag = "SUPRALINEAR"
                n_flagged += 1
                break
        rows.append([n, s01 or "", s1 or "", sr, s10 or "", sr10,
                     s10c or "", s100 or "", sr100,
                     bb01 or "", bb1 or "", br, bb10 or "", br10,
                     flag, res1.get(n, ""), res10.get(n, ""), res100.get(n, "")])

    out = os.path.join(EV, f"scale_slope_{mode}.csv" if mode else "scale_slope.csv")
    with open(out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["query", "spark_sf0.1_sec", "spark_sf1_sec", "spark_ratio_1",
                    "spark_sf10_sec", "spark_ratio_10",
                    "spark_sf10_cold_sec", "spark_sf100_cold_sec",
                    "spark_ratio_100",
                    "bench_sf0.1_sec", "bench_sf1_sec", "bench_ratio_1",
                    "bench_sf10_sec", "bench_ratio_10",
                    "flag", "sf1_status", "sf10_status", "sf100_status"])
        w.writerows(rows)
    print(f"wrote {out}: {len(rows)} queries, {n_flagged} flagged > {FLAG_RATIO}x")
    for r in rows:
        if r[14]:
            print("  FLAG", r[0], "ratios", r[3], r[5], r[8], r[11], r[13])


if __name__ == "__main__":
    main()
