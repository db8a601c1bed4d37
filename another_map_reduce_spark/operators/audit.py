"""Declarative data-quality constraint audit — [extension].

The Deequ / Great Expectations pattern (Schelter et al., VLDB 2018:
"Automating Large-Scale Data Quality Verification"): a declarative
rule table — completeness, uniqueness, value ranges, set membership,
referential integrity — compiled to ONE aggregation pass per table
plus one anti-join per foreign key, emitting a (rule, table,
violations, n_rows, passed) report.  The audit every ingest gate runs
before data reaches training; the reference has no notion of
constraints at all (its records are untyped strings,
`/root/reference/src/worker.rs:23-38`).

Scale shape: all scan rules of a table share one scan and one
map-side-partial aggregate (violations are SUMs of boolean casts —
no per-rule passes); each FK rule is a left-anti join that Catalyst
broadcasts when the parent is dim-sized and shuffles otherwise; the
report is |rules| rows.  The same rule spec generates the DuckDB
oracle SQL, so the two engines cannot drift (the data_profile_summary
anti-drift construction).

Rule kinds (violation definitions, identical in both generators):
* not_null(col)        — col IS NULL
* unique(col)          — COUNT(*) − COUNT(DISTINCT col)
* range(col, lo, hi)   — col IS NOT NULL AND (col < lo OR col > hi)
* in_set(col, values)  — col IS NOT NULL AND col NOT IN values
* fk(col, ref, refcol) — col IS NOT NULL AND no matching ref row
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _scan_violation(rule: dict) -> "F.Column":
    c = F.col(rule["col"])
    if rule["kind"] == "not_null":
        return c.isNull()
    if rule["kind"] == "range":
        return c.isNotNull() & ((c < rule["lo"]) | (c > rule["hi"]))
    if rule["kind"] == "in_set":
        return c.isNotNull() & ~c.isin(*rule["values"])
    raise ValueError(rule["kind"])


def _rule_name(rule: dict) -> str:
    k = rule["kind"]
    if k in ("not_null", "unique"):
        return f"{k}({rule['col']})"
    if k == "range":
        return f"range({rule['col']}, {rule['lo']}, {rule['hi']})"
    if k == "in_set":
        vals = ", ".join(rule["values"])
        return f"in_set({rule['col']}: {vals})"
    if k == "fk":
        return f"fk({rule['col']} -> {rule['ref']}.{rule['refcol']})"
    raise ValueError(k)


def run_audit(
    tables: dict[str, DataFrame], spec: list[dict]
) -> DataFrame:
    """Compile the rule spec against loaded tables; returns the audit
    report (rule, tbl, violations, n_rows, passed) ordered by
    (tbl, rule)."""
    frames: list[DataFrame] = []
    for tbl in sorted({r["table"] for r in spec}):
        rules = [r for r in spec if r["table"] == tbl]
        df = tables[tbl]
        scan = [r for r in rules if r["kind"] in ("not_null", "range", "in_set")]
        uniq = [r for r in rules if r["kind"] == "unique"]
        fks = [r for r in rules if r["kind"] == "fk"]
        if scan or uniq:
            aggs = [F.count("*").alias("_n")]
            names = []
            for i, r in enumerate(scan):
                aggs.append(
                    F.coalesce(
                        F.sum(_scan_violation(r).cast("long")), F.lit(0)
                    ).alias(f"_v{i}")
                )
                names.append((_rule_name(r), f"_v{i}"))
            for i, r in enumerate(uniq):
                aggs.append(
                    (F.count(r["col"]) - F.count_distinct(F.col(r["col"])))
                    .alias(f"_u{i}")
                )
                names.append((_rule_name(r), f"_u{i}"))
            row = df.agg(*aggs)
            frames.append(
                row.select(
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(nm).alias("rule"),
                                    F.col(cl).alias("violations"),
                                )
                                for nm, cl in names
                            ]
                        )
                    ).alias("r"),
                    F.col("_n"),
                ).select(
                    F.col("r.rule").alias("rule"),
                    F.lit(tbl).alias("tbl"),
                    F.col("r.violations").cast("long").alias("violations"),
                    F.col("_n").cast("long").alias("n_rows"),
                )
            )
        for r in fks:
            # one pass per FK: left join against the deduped parent
            # keys, counting rows and orphans in the same aggregate —
            # no separate COUNT(*) scan for n_rows
            parent = (
                tables[r["ref"]]
                .select(F.col(r["refcol"]).alias("_pk"))
                .distinct()
            )
            joined = df.select(F.col(r["col"]).alias("_k")).join(
                parent, F.col("_k") == F.col("_pk"), "left"
            )
            stats = joined.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(
                        (
                            F.col("_k").isNotNull()
                            & F.col("_pk").isNull()
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("violations"),
            )
            frames.append(
                stats.select(
                    F.lit(_rule_name(r)).alias("rule"),
                    F.lit(tbl).alias("tbl"),
                    F.col("violations").cast("long"),
                    F.col("n_rows").cast("long"),
                )
            )
    if not frames:
        raise ValueError("empty audit spec: no rules to run")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "rule", "tbl", "violations", "n_rows",
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("tbl", "rule")


def _sql_quote(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def audit_oracle_sql(spec: list[dict]) -> str:
    """The identical audit as DuckDB SQL, generated from the same
    spec: one SELECT per rule, UNION ALL, same violation predicates."""
    selects = []
    for r in spec:
        name = _rule_name(r).replace("'", "''")
        tbl = r["table"]
        if r["kind"] == "not_null":
            m = f"COUNT(*) FILTER ({r['col']} IS NULL)"
        elif r["kind"] == "unique":
            m = f"COUNT({r['col']}) - COUNT(DISTINCT {r['col']})"
        elif r["kind"] == "range":
            m = (
                f"COUNT(*) FILTER ({r['col']} IS NOT NULL AND "
                f"({r['col']} < {r['lo']} OR {r['col']} > {r['hi']}))"
            )
        elif r["kind"] == "in_set":
            vals = ", ".join(_sql_quote(v) for v in r["values"])
            m = (
                f"COUNT(*) FILTER ({r['col']} IS NOT NULL AND "
                f"{r['col']} NOT IN ({vals}))"
            )
        elif r["kind"] == "fk":
            m = (
                f"COUNT(*) FILTER ({r['col']} IS NOT NULL AND NOT EXISTS "
                f"(SELECT 1 FROM {r['ref']} p "
                f"WHERE p.{r['refcol']} = {tbl}.{r['col']}))"
            )
        else:
            raise ValueError(r["kind"])
        selects.append(
            f"SELECT '{name}' AS rule, '{tbl}' AS tbl, "
            f"CAST({m} AS BIGINT) AS violations, "
            f"CAST(COUNT(*) AS BIGINT) AS n_rows FROM {tbl}"
        )
    body = " UNION ALL ".join(selects)
    return (
        f"SELECT rule, tbl, violations, n_rows, violations = 0 AS passed "
        f"FROM ({body}) ORDER BY tbl, rule"
    )
