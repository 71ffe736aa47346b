"""Count the Spark JOBS a registered query launches end-to-end.

Gate queries do most of their work while the query function BUILDS its
result (lifecycle commits, micro-batch replays), so their formatted plan
shows only the final read — the honest job-count evidence for "fewer
sequential jobs per commit" claims comes from the scheduler itself. Each
query runs inside its own job group; the status tracker reports every job
the group launched (including the noop-sink action on the returned frame).

Usage:
  python tools/count_jobs.py QUERY[,QUERY...] [ENVVAR=a|b[,...]]

With a variant spec, variants run interleaved in one session (same regime
as tools/ab_timer.py) and per-variant job counts print side by side.
"""

from __future__ import annotations

import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1].split(",")
    specs = [s for s in (sys.argv[2].split(",") if len(sys.argv) > 2 else []) if s]
    assigns: list[tuple[str, list[str]]] = []
    for s in specs:
        var, vals = s.split("=", 1)
        assigns.append((var, vals.split("|")))
    n_variants = max((len(v) for _, v in assigns), default=1)

    from fxa_amplitude_send_spark.plans import all_queries
    from fxa_amplitude_send_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("count-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in names:
        for vi in range(n_variants):
            for var, vals in assigns:
                os.environ[var] = vals[min(vi, len(vals) - 1)]
            group = f"cj-{uuid.uuid4().hex[:8]}"
            sc = spark.sparkContext
            sc.setJobGroup(group, f"{name} v{vi}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            lab = ",".join(
                f"{var}={vals[min(vi, len(vals) - 1)]}" for var, vals in assigns
            )
            print(f"{name} [{lab}] jobs={len(jobs)} wall={dt:.2f}s", flush=True)


if __name__ == "__main__":
    main()
