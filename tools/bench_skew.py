"""Skewed-key scaling bench: salted/AQE plans vs their naive twins on
the Zipf fixture (make_scale_data.py --skew — 35%/15% of rows on two
hot users, rest uniform over ~10k).

Two workload families, each measured naive-vs-treated:

* JOIN   — events ⋈ derived user dim (sort-merge, broadcast disabled):
           plain SMJ with AQE skew-splitting OFF, the same with AQE
           skew-splitting ON, and operators/skew.salted_join.
* AGG    — COUNT(DISTINCT event_id) BY user_id: the distinct forces
           every (user, event) pair through the key's partition (plain
           sum/count would be saved by map-side combine and show no
           skew), vs the salted two-phase distinct.

AQE's skew thresholds default to cluster scale (256 MB hot-partition
floor); the fixture is hundreds of MB total, so the measurement scales
them down (8 MB floor / 4 MB advisory) — the same proportional knob a
real deployment turns, stated here so the numbers are honest.

Usage: python tools/bench_skew.py [out.json]
  (expects /tmp/skewscale{10,100} — builds them from sf0.1 if absent)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = [
    ("10x", "/tmp/skewscale10", 10),
    ("100x", "/tmp/skewscale100", 100),
]

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
}


def _timed(fn, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_skew.json"
    for _tag, d, n in SCALES:
        if not os.path.exists(os.path.join(d, "events.parquet")):
            subprocess.run(
                [sys.executable, str(Path(__file__).parent / "make_scale_data.py"),
                 "/root/testdata/sf0.1", d, str(n), "--skew"],
                check=True,
            )

    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.skew import salted_agg, salted_join
    from another_map_reduce_spark.session import get_spark
    from another_map_reduce_spark.sources.tables import load_table

    spark = get_spark(app_name="amrs-bench-skew", master="local[32]")
    # conf.get(key, None): adaptive.autoBroadcastJoinThreshold defaults
    # to null — restore must UNSET those, set() rejects None.
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)

    results = {}
    try:
        for tag, d, _n in SCALES:
            ev = load_table(spark, d, "events")
            # Materialized, or OptimizeSkewedJoin's SMJ(Sort(Shuffle),
            # Sort(Shuffle)) pattern never matches — see skew_join_aqe.
            dim = (
                ev.select("user_id").distinct()
                .withColumn("segment", (F.col("user_id") % 10).cast("long"))
                .localCheckpoint(eager=True)
            )
            dec = F.col("value").cast("decimal(38,6)")

            def join_plain():
                (ev.join(dim.hint("merge"), "user_id")
                   .groupBy("segment")
                   .agg(F.count("*").alias("n"), F.sum(dec).alias("s"))
                   .collect())

            def join_salted():
                (salted_join(ev, dim, ["user_id"], salt=16)
                   .groupBy("segment")
                   .agg(F.count("*").alias("n"), F.sum(dec).alias("s"))
                   .collect())

            def agg_plain():
                (ev.groupBy("user_id")
                   .agg(F.count_distinct("event_id").alias("nd"))
                   .agg(F.sum("nd")).collect())

            def agg_salted():
                (salted_agg(
                    ev, ["user_id"],
                    [F.count_distinct("event_id").alias("_nd")],
                    [F.sum("_nd").alias("nd")])
                   .agg(F.sum("nd")).collect())

            row = {}
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            row["join_plain_noaqe_sec"] = _timed(join_plain)
            row["join_salted_sec"] = _timed(join_salted)
            row["agg_distinct_plain_sec"] = _timed(agg_plain)
            row["agg_distinct_salted_sec"] = _timed(agg_salted)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            row["join_aqe_skewsplit_sec"] = _timed(join_plain)
            results[tag] = row
            print(json.dumps({tag: row}))
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
