"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir, runs
the matching ``oracle_sql()`` in DuckDB with the ten tables registered
as views, and compares: row count, sorted column names, and an
order-insensitive value hash (per-row canonical string, floats rounded,
rows sorted).  Usage::

    python tools/verify_local.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def compare_query(spark, con, fn, sql: str, sf_dir: str) -> list[str]:
    """Run one Spark query + its DuckDB oracle; return a list of problems
    (empty = match).  ``con`` must already have the table views."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rows {len(srows)} vs {len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
    elif value_hash(scols, srows) != value_hash(ocols, orows):
        problems.append("value hash mismatch")
    return problems


def make_oracle_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from another_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(srows)} rows ({dt:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows on rows-only check")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value hash mismatch")
            # show a few differing lines to debug
            s_set = {
                "|".join(
                    _canon_cell(r[i])
                    for i in sorted(range(len(scols)), key=lambda i: scols[i])
                )
                for r in srows
            }
            o_set = {
                "|".join(
                    _canon_cell(r[i])
                    for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                )
                for r in orows
            }
            for d in list(s_set - o_set)[:3]:
                print(f"        spark-only: {d}")
            for d in list(o_set - s_set)[:3]:
                print(f"        duck-only : {d}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s)")

    print(f"\n{len(failures)} failure(s)" if failures else "\nall checked queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
