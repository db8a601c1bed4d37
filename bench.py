"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "...",
   "n_queries": N, "queries_omitted": M, "omitted_sec": S,
   "oracle_total_sec": N}

The stdout line is SIZE-BUDGETED: the driver records only the tail of
bench output (~2 KB — BENCH_r03/r04 both show `parsed: null` with the
line truncated mid-way once the suite passed ~100 queries), so the
"queries" dict carries the slowest queries only, up to a byte budget,
with the omitted remainder summarized in queries_omitted/omitted_sec
(`value` is always the FULL suite total).  The complete per-query
and per-oracle detail goes to BENCH_FULL.json at the repo root and to
stderr, so nothing is lost — just moved off the one parsed line.

Methodology: bounded results (aggregates / top-k / pair sets — ≲1k
rows at any SF) are executed with ``collect()`` so the measured time
covers the FULL plan including final sorts and projections (``count()``
lets Catalyst prune those).  Data-proportional outputs (per-row
projections, window functions over the fact tables — O(input) rows)
are executed with ``count()`` so driver transfer doesn't dominate the
measurement.  The split is the explicit ``UNBOUNDED`` set below.

The oracle pass times the same DuckDB SQL the driver's correctness
gate runs (one run per DISTINCT SQL string per pass; queries sharing
an oracle — e.g. the exact-jaccard SQL backing both
dedup_ngram_jaccard and dedup_minhash_lsh — report the same
measurement), so the Spark:DuckDB ratio is auditable from the bench
artifact alone.  Disable with SPARK_GRAFT_BENCH_ORACLE=0.

MEDIAN-OF-N (r11): this shared host shows up to ~1.3x run-to-run
noise on identical work (BASELINE.md records the oracle wall swinging
357<->477 s on the same SQL), so BOTH columns report the per-query
MEDIAN of SPARK_GRAFT_BENCH_PASSES runs (default 3) and BENCH_FULL
carries every sample (queries_samples / oracle_samples) — a
round-over-round regression is attributable iff it clears the
recorded dispersion.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Outputs that scale O(input rows) at any SF — measured with count().
UNBOUNDED = {
    "filter_project",
    "join_left_outer",
    "subquery_above_avg",
    "scalar_string_date_math",
    "null_handling",
    "array_functions",
    "json_struct_parse",
    "window_running_sum",
    "window_rank_family",
    "window_time_range_sum",
    "window_lag_lead",
    "window_topk_per_group",
    "asof_last_purchase",
    "range_views_before_purchase",
    "session_windows_batch",
    "text_token_stats",
    "multimodal_meta",
    "doc_winnowing_stats",
    "dup_substring_stats",
    "dup_substring_removal",
    # r8 continuation: per-event as-of output / per-purchase join rows
    "cogroup_asof_pandas",
    "stream_join_outer_nulls",
}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _time_oracles(
    sf_dir: str, passes: int, names: list[str] | None = None
) -> tuple[dict[str, float], dict[str, list[float]]]:
    import duckdb

    from another_map_reduce_spark.queries import ORACLES as _ALL

    ORACLES = (
        {n: _ALL[n] for n in names if n in _ALL}
        if names is not None
        else _ALL
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    by_sql: dict[str, list[float]] = {}
    failed: set[str] = set()
    for _pass in range(passes):
        for sql in dict.fromkeys(ORACLES.values()):
            if sql in failed:
                continue  # failed on an earlier pass — skip
            try:
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                by_sql.setdefault(sql, []).append(
                    round(time.perf_counter() - t0, 3)
                )
            except Exception as exc:  # keep the bench line intact
                print(f"# oracle failed: {exc}", file=sys.stderr)
                failed.add(sql)
                by_sql.setdefault(sql, [])
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name, sql in ORACLES.items():
        if by_sql.get(sql):
            timings[name] = round(_median(by_sql[sql]), 3)
            samples[name] = by_sql[sql]
    # total = median wall per distinct SQL, summed
    timings["__total_distinct__"] = round(
        sum(_median(v) for v in by_sql.values() if v), 3
    )
    return timings, samples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from another_map_reduce_spark.queries import QUERIES
    from another_map_reduce_spark.session import get_spark

    # Optional subset (comma-separated names): the sf1 headline run
    # and ad-hoc re-measurements; default = full suite.
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    queries = dict(QUERIES)
    if subset_env.strip():
        wanted = [q.strip() for q in subset_env.split(",") if q.strip()]
        unknown = [q for q in wanted if q not in queries]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        queries = {q: QUERIES[q] for q in wanted}

    spark = get_spark(app_name="amrs-bench", master=f"local[{cpus}]")

    # N passes (default 3), MEDIAN per query: robust to the shared
    # host's run-to-run noise, and the recorded samples make any
    # round-over-round "regression" attributable (vs dispersion)
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    # r13 (measurement hygiene, guide §1/§5): a 236-query suite leaves
    # each query's localCheckpoint blocks, py4j object handles and
    # Dataset plans alive in the shared session until a JVM GC cycle
    # lets ContextCleaner reclaim them; measured in-suite inflation on
    # block-heavy rows was 3-6x vs the same query isolated
    # (ann_cosine_pairs 18-37 s in-suite vs 5.4 s isolated, passes
    # /tmp-logged + OPTIMIZATION_r13.md).  After each TIMED region:
    # drop the Python refs, collect Python garbage (flushes py4j
    # detach commands), and every few queries ask the JVM for a GC so
    # the weak-ref queue drains and storage memory is actually
    # returned.  All of it runs OUTSIDE the per-query timer; no query
    # result or plan changes.
    gc_every = int(os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "4"))
    import gc as _gc

    from another_map_reduce_spark import phases as _phases

    jvm_gc = spark.sparkContext._jvm.System.gc
    samples: dict[str, list[float]] = {}
    phase_samples: dict[str, list[dict[str, float]]] = {}
    qi = 0
    gc_sec = 0.0  # cumulative UNTIMED between-query cleanup wall
    for _pass in range(passes):
        for name, fn in queries.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count() if name in UNBOUNDED else len(df.collect())
            dt = round(time.perf_counter() - t0, 3)
            samples.setdefault(name, []).append(dt)
            # r14 (VERDICT r13 #4): queries that label build/produce
            # vs probe/drain phases publish the split per pass — a
            # decomposition of dt, not an exclusion from it.
            ph = _phases.drain(name)
            if ph is not None:
                phase_samples.setdefault(name, []).append(ph)
            print(f"# pass{_pass} {name}: {dt}s ({n} rows)", file=sys.stderr)
            # r14 (VERDICT r13 #7): the cleanup below runs OUTSIDE the
            # per-query timers, so its wall time would otherwise vanish
            # from the artifact; gc_sec records the cumulative cost so
            # the hygiene stays auditable.
            g0 = time.perf_counter()
            del df
            _gc.collect()
            qi += 1
            if gc_every and qi % gc_every == 0:
                jvm_gc()
            gc_sec += time.perf_counter() - g0
    timings = {n: round(_median(v), 3) for n, v in samples.items()}
    # WARM medians (r13 — VERDICT r12 protocol note #8): the first
    # pass pays one-time artifact builds and JIT/cache warmup, and
    # median-of-3 INCLUDING it turned host noise into apparent
    # regressions two rounds running.  warm = median of passes 2..n
    # (falls back to the full median on single-pass runs); both
    # numbers are reported so cold-pass noise stops reading as
    # regression without hiding the cold cost.
    warm = {
        n: round(_median(v[1:]), 3) if len(v) > 1 else round(_median(v), 3)
        for n, v in samples.items()
    }

    full = {
        "metric": (
            f"headline-suite wall clock, sequential, median of "
            f"{passes} passes"
        ),
        "value": round(sum(timings.values()), 3),
        "warm_value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "queries_samples": samples,
        "queries_phases": phase_samples,
        "gc_sec": round(gc_sec, 3),
        "sf": sf_dir.rstrip("/").rsplit("/", 1)[-1],
    }
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0":
        oracle, osamples = _time_oracles(
            sf_dir,
            passes,
            names=list(queries) if subset_env.strip() else None,
        )
        full["oracle_total_sec"] = oracle.pop("__total_distinct__", 0.0)
        full["oracle_queries"] = oracle
        full["oracle_samples"] = osamples
        # THE ratio, pinned (r6 reported 0.95x in a commit message and
        # 0.81x in the artifact under two exclusion rules — never
        # again): full Spark suite total over distinct-oracle-SQL wall
        # time, NO exclusions, reproducible from this artifact alone as
        # value / oracle_total_sec.
        if full["oracle_total_sec"]:
            full["ratio_vs_oracle"] = round(
                full["value"] / full["oracle_total_sec"], 3
            )
            full["ratio_warm_vs_oracle"] = round(
                full["warm_value"] / full["oracle_total_sec"], 3
            )
            full["ratio_definition"] = (
                "value/oracle_total_sec: all queries, distinct oracle "
                "SQL timed once, no exclusions; warm = median of "
                "passes 2..n (cold pass excluded)"
            )

    # Full detail → repo artifact + stderr; stdout gets the budgeted line.
    # The committed BENCH_FULL.json is the per-round sf0.1 record: a run
    # at any other SF (verify smoke at sf0.01, scale experiments) writes
    # an SF-suffixed sibling instead of clobbering the round artifact.
    sf_tag = full["sf"]
    # A subset run must not clobber the committed full-suite artifact
    # for its SF — it lands in a _subset sibling instead.
    if subset_env.strip():
        fname = f"BENCH_SUBSET_{sf_tag}.json"
    elif sf_tag == "sf0.1":
        fname = "BENCH_FULL.json"
    else:
        fname = f"BENCH_FULL_{sf_tag}.json"
    try:
        out = Path(__file__).resolve().parent / fname
        out.write_text(json.dumps(full, indent=1) + "\n")
    except OSError as exc:
        print(f"# BENCH_FULL.json not written: {exc}", file=sys.stderr)
    print(f"# full result: {json.dumps(full)}", file=sys.stderr)

    compact = {
        k: v
        for k, v in full.items()
        if k
        not in (
            "oracle_queries",
            "oracle_samples",
            "queries_samples",
            "queries_warm",
            "queries_phases",
        )
    }
    slowest = sorted(timings, key=timings.get, reverse=True)
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BYTES", "1600"))
    # Seed the schema keys so a 0/1-query suite (where the loop body
    # runs at most once) still emits the full documented shape.
    compact["n_queries"] = len(timings)
    compact["queries"] = {}
    compact["queries_omitted"] = len(timings)
    compact["omitted_sec"] = round(sum(timings.values()), 3)
    n_keep = len(slowest)
    while n_keep >= 1:
        kept = slowest[:n_keep]
        compact["queries"] = {n: timings[n] for n in kept}
        compact["queries_omitted"] = len(timings) - n_keep
        compact["omitted_sec"] = round(
            sum(timings[n] for n in slowest[n_keep:]), 3
        )
        # n_keep==1 is the floor: emit that variant even if it still
        # exceeds the budget (one query name can't be trimmed further).
        if len(json.dumps(compact)) <= budget or n_keep == 1:
            break
        n_keep -= max(1, n_keep // 8)
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
