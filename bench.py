"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "..."}

Each query is executed to completion (collect of a bounded result or a
count for unbounded ones) so the measured time covers the full plan,
not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from another_map_reduce_spark.queries import QUERIES
    from another_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="amrs-bench", master=f"local[{cpus}]")

    # two passes, min per query: this shared host shows 10x run-to-run
    # noise under contention; min-of-2 reports the machine's capability
    # rather than the noisiest moment
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            print(f"# pass{_pass} {name}: {dt}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall clock, sequential, min of 2 passes",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("/", 1)[-1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
