"""Benchmark harness: runs every registered engine query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with the noop sink (full plan runs, nothing materializes
on the driver) — measures engine throughput, not pandas conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from fxa_amplitude_send_spark.session import build_session

    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = build_session("fxa-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from fxa_amplitude_send_spark.plans import all_queries

    queries = all_queries()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm up the JVM/codegen once (not counted).
    run_once(queries["q_scan_project"])

    # Best-of-2 per query: the first run pays one-time plan analysis +
    # whole-stage-codegen compilation (irrelevant at 100 TB where it
    # amortizes to zero); the repeat measures engine throughput.
    timings: dict[str, float] = {}
    wall_start = time.perf_counter()
    for name in sorted(queries):
        try:
            timings[name] = round(min(run_once(queries[name]) for _ in range(2)), 4)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    wall = round(time.perf_counter() - wall_start, 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "method": "best_of_2_noop_sink",
                "wall_seconds": wall,
            }
        )
    )


if __name__ == "__main__":
    main()
