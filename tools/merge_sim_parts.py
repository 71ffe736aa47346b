"""Merge per-query DRIVER_SIM_OUT part files (one-process-per-query scale
studies, see run_sf100_study.sh) into one report with the same shape a
single run would have written: {results, timings, summary}."""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    parts_dir, out_path = sys.argv[1], sys.argv[2]
    merged: dict = {"results": {}, "timings": {}}
    counts = {"match": 0, "rows_only": 0, "fail": 0}
    sf_dir = None
    for p in sorted(glob.glob(os.path.join(parts_dir, "*.json"))):
        with open(p) as fh:
            part = json.load(fh)
        merged["results"].update(part.get("results", {}))
        merged["timings"].update(part.get("timings", {}))
        s = part.get("summary", {})
        for k in counts:
            counts[k] += s.get(k, 0)
        sf_dir = sf_dir or s.get("sf_dir")
    merged["summary"] = dict(counts, sf_dir=sf_dir)
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(f"merged {len(merged['results'])} queries -> {out_path}: {counts}")


if __name__ == "__main__":
    main()
