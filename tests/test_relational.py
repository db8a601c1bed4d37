"""Differential tests: every oracle-checked query vs DuckDB at sf0.001.

Same comparison the driver runs at sf0.01 (row count + column names +
order-insensitive value hash) — catching mismatches at the small SF
keeps the suite fast while exercising identical semantics.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from verify_local import compare_query, make_oracle_con  # noqa: E402

from another_map_reduce_spark.queries import ORACLES, QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = make_oracle_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    problems = compare_query(spark, oracle_con, QUERIES[name], ORACLES[name], sf_dir)
    assert not problems, f"{name}: {problems}"


def test_every_query_runs(spark, sf_dir):
    """Queries without oracles still must run and have a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_session_overlap_cell_width_invariance(spark, sf_dir):
    """The grid-cell width is a performance dial, not a semantics dial:
    re-running the overlap join with 30-minute cells instead of 1-hour
    cells must produce the identical aggregate."""
    from another_map_reduce_spark.plans import analytics as A

    base = A.session_overlap_pairs(spark, sf_dir).collect()
    orig = A._CELL_US
    A._CELL_US = 1_800 * 1_000_000
    try:
        halved = A.session_overlap_pairs(spark, sf_dir).collect()
    finally:
        A._CELL_US = orig
    assert [tuple(r) for r in base] == [tuple(r) for r in halved]
