"""BENCH_SF3_SUBSET: the dedup/ingest headliners at a GENUINE sf3.

The r11 verdict's task #8 — push genuine (non-replicated) scale one
notch past sf1 on the winners.  The corpus comes from
``tools/make_sf1.py OUT /root/testdata/sf0.1 30`` (30× sf0.1 row
counts, vocabulary expanded 30× so per-shingle document frequency —
and therefore dedup pair work — scales linearly, the Heaps'-law
shape a real corpus has).

For each query: hash-verify Spark vs the DuckDB oracle at sf3 first
(correctness before pricing), then record Spark wall (2 passes, the
second is the warm/priced one) and ONE oracle pass.  The oracle
subset is deliberately small — brute-force SQL over 150k docs is the
expensive side.

Usage: python tools/bench_sf3_subset.py [SF3_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cc_clusters",
    "dedup_incremental_minhash",
    "pipeline_ingest_delta",
    "pipeline_ingest_replay",
]
# Hash-verify + price the oracle only for the two headliners: at sf1
# the six oracles cost 43 min of brute-force SQL; sf3 would be hours.
# The other four record Spark growth vs their sf1 rows (hash-verified
# there) — flat-or-linear growth is the claim this artifact pins.
ORACLE_QUERIES = {"dedup_minhash_lsh", "pipeline_ingest_delta"}


def main() -> None:
    sf3 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf3"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF3_SUBSET.json"

    import duckdb

    from another_map_reduce_spark.queries import ORACLES, QUERIES as QS
    from another_map_reduce_spark.session import get_spark
    from tools.verify_local import frame_hash  # driver-faithful hash

    spark = get_spark(app_name="amrs-sf3", master="local[32]")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf3}/{t}.parquet'"
        )

    result: dict = {"sf": "sf3(genuine,30x sf0.1)", "queries": {}}
    for name in QUERIES:
        row: dict = {}
        # pass 0 (cold, includes any artifact build) + pass 1 (warm)
        for p in range(2):
            t0 = time.perf_counter()
            sdf = QS[name](spark, sf3)
            pdf = sdf.toPandas()
            row[f"spark_pass{p}"] = round(time.perf_counter() - t0, 3)
        if name in ORACLE_QUERIES:
            print(f"# {name}: oracle starting", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            odf = con.execute(ORACLES[name]).fetchdf()
            row["oracle"] = round(time.perf_counter() - t0, 3)
            ok = (
                len(pdf) == len(odf)
                and sorted(pdf.columns) == sorted(odf.columns)
                and frame_hash(pdf) == frame_hash(odf)
            )
            row["hash_match"] = bool(ok)
        row["rows"] = int(len(pdf))
        result["queries"][name] = row
        print(f"# {name}: {row}", file=sys.stderr, flush=True)

    result["spark_warm_total"] = round(
        sum(r["spark_pass1"] for r in result["queries"].values()), 3
    )
    result["oracle_total"] = round(
        sum(r.get("oracle", 0.0) for r in result["queries"].values()), 3
    )
    if result["oracle_total"]:
        oracled_warm = sum(
            r["spark_pass1"]
            for n, r in result["queries"].items()
            if "oracle" in r
        )
        result["ratio_warm_vs_oracle_subset"] = round(
            oracled_warm / result["oracle_total"], 3
        )
    Path(out_path).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
