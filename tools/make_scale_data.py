"""Build scale-up corpora for the heavy-block scaling bench.

Replicates the sf0.1 documents/embeddings tables N× in a way that
preserves the per-replica workload SHAPE instead of manufacturing
artificial cross-replica duplicates (naive replication would make every
doc an exact/near dup of its 9 clones and every vector cosine-1.0 to
its copies — a skew stress test, not a scaling measurement):

- documents: replica r suffixes every NON-stopword token with ``~r{r}``
  (replica 0 is the original).  Within a replica, the planted near-dup
  structure is transformed identically, so pair/cluster counts scale
  linearly with N.  Across replicas the content vocabulary is disjoint;
  only Gopher stopwords are shared, so the quality gate's stopword-hit
  selectivity — and therefore the corpus-build pipeline's stage sizes —
  scale exactly.  (Stopword-only shingles that cross replicas are the
  hot-shingle long tail the dedup operators' max_df cap already
  handles.)  doc_id' = doc_id + r·1e7.
- embeddings: replica r applies a deterministic permutation of the 64
  dimensions — orthogonal, so within-replica cosines are MATHEMATICALLY
  preserved (not bit-preserved: a permuted dot product sums in a
  different order, so a pair sitting exactly on a threshold can flip
  by an ulp; fine for a perf corpus, don't oracle-compare across
  replicas) — and offsets vec_id (+r·1e7) and label (+r·1000) so
  label-blocked
  operators never compare across replicas and cross-replica cosines of
  the UNblocked operators are near-orthogonal noise.

Writes {documents,embeddings}.parquet to the target dir.  The other
tables are symlinked from the base dir so load_table finds them.

Usage: python tools/make_scale_data.py BASE_SF_DIR OUT_DIR N_REPLICAS
"""

from __future__ import annotations

import os
import random
import re
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from another_map_reduce_spark.operators.quality import GOPHER_STOPWORDS

_TOKEN = re.compile(r"\S+")
_ID_STRIDE = 10_000_000


def _remap_text(text: str, r: int) -> str:
    stop = set(GOPHER_STOPWORDS)

    def sub(m: re.Match) -> str:
        t = m.group(0)
        return t if t.lower() in stop else f"{t}~r{r}"

    return _TOKEN.sub(sub, text)


def build(base: str, out: str, n: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT * FROM read_parquet('{base}/documents.parquet')"
    ).fetch_arrow_table()
    embs = con.execute(
        f"SELECT * FROM read_parquet('{base}/embeddings.parquet')"
    ).fetch_arrow_table()

    d_chunks, e_chunks = [], []
    dim = len(embs.column("embedding")[0].as_py())
    for r in range(n):
        if r == 0:
            d_chunks.append(docs)
            e_chunks.append(embs)
            continue
        texts = [
            _remap_text(t, r) for t in docs.column("text").to_pylist()
        ]
        d_chunks.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        [i + r * _ID_STRIDE for i in docs.column("doc_id").to_pylist()],
                        pa.int64(),
                    ),
                    "text": pa.array(texts, pa.string()),
                    "lang": docs.column("lang"),
                    "source": docs.column("source"),
                    "n_chars": pa.array(
                        [len(t) for t in texts], pa.int64()
                    ),
                }
            )
        )
        perm = list(range(dim))
        random.Random(r).shuffle(perm)
        e_chunks.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        [i + r * _ID_STRIDE for i in embs.column("vec_id").to_pylist()],
                        pa.int64(),
                    ),
                    "embedding": pa.array(
                        [
                            [v[p] for p in perm]
                            for v in embs.column("embedding").to_pylist()
                        ],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array(
                        [int(x) + r * 1000 for x in embs.column("label").to_pylist()],
                        pa.int32(),
                    ),
                }
            )
        )
    pq.write_table(pa.concat_tables(d_chunks), f"{out}/documents.parquet")
    pq.write_table(pa.concat_tables(e_chunks), f"{out}/embeddings.parquet")
    for f in Path(base).glob("*.parquet"):
        if f.stem in ("documents", "embeddings"):
            continue
        dst = Path(out) / f.name
        # resolve(): a relative BASE dir would otherwise be stored
        # verbatim and dangle when resolved against OUT; is_symlink():
        # exists() is False for a broken link, which would crash reruns
        if not (dst.is_symlink() or dst.exists()):
            os.symlink(f.resolve(), dst)
    print(
        f"wrote {out}: documents x{n} "
        f"({sum(len(c) for c in d_chunks)} rows), embeddings x{n} "
        f"({sum(len(c) for c in e_chunks)} rows)"
    )


# Disjoint key-offset strides for the relational replication: each
# replica's keys land in their own range, so replicas never join across
# — N replicas = N independent copies of the workload, the shape under
# which join/agg/graph scaling is a measurement rather than a skew
# stress test.  Offsets stay far below the 1e9 customer-node offset
# pagerank_suppliers uses, so the graph's node id spaces stay disjoint.
_REL_STRIDES = {
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "c_custkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "l_partkey": 10_000_000,
    "p_partkey": 10_000_000,
}

_REL_TABLES = ("orders", "lineitem", "customer", "supplier", "part")


def build_relational(base: str, out: str, n: int) -> None:
    """Replicate the star schema N× with disjoint key offsets (one
    DuckDB cross-join-with-range COPY per table — no Python row
    loops).  Non-key columns are carried verbatim, so per-replica
    selectivities, group cardinalities, and join fan-outs are exactly
    the base workload's; region/nation (geography dims) and the
    corpus tables stay shared via symlink."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in _REL_TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{base}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + r.r * {_REL_STRIDES[c]} AS {c}" if c in _REL_STRIDES else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} "
            f"FROM read_parquet('{base}/{t}.parquet'), range({n}) r(r)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n_rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"wrote {out}/{t}.parquet x{n} ({n_rows} rows)")
    for f in Path(base).glob("*.parquet"):
        if f.stem in _REL_TABLES:
            continue
        dst = Path(out) / f.name
        if not (dst.is_symlink() or dst.exists()):
            os.symlink(f.resolve(), dst)


def build_events(base: str, out: str, n: int) -> None:
    """Replicate events N× with DISJOINT user populations (user_id +
    r·1e6, event_id + r·stride) over the SAME 30-day window — more
    users, same period, which is how an event stream actually grows.
    Per-user structure (sessions, funnels, transition chains) is
    preserved within each replica, so user-keyed operators scale as N
    independent copies; TIME-keyed operators (overlap pairs, peak
    concurrency, daily sketches) see the real cross-population
    interaction — overlap-pair counts grow ~quadratically because the
    true answer does.  Other tables symlinked."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT event_id + r.r * {_ID_STRIDE} AS event_id, ts,
         user_id + r.r * 1000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{base}/events.parquet'), range({n}) r(r)
) TO '{out}/events.parquet' (FORMAT PARQUET)
"""
    )
    n_rows = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/events.parquet')"
    ).fetchone()[0]
    print(f"wrote {out}/events.parquet x{n} ({n_rows} rows)")
    for f in Path(base).glob("*.parquet"):
        if f.stem == "events":
            continue
        dst = Path(out) / f.name
        if not (dst.is_symlink() or dst.exists()):
            os.symlink(f.resolve(), dst)


def build_skew(base: str, out: str, n: int) -> None:
    """Replicate events N× with the user_id distribution REASSIGNED to
    a Zipf-like head: 35% of all rows land on user 1, 15% on user 2,
    the remaining half uniform over ~10k cold users.  This is the
    pathological-key fixture the salted/AQE skew operators exist for —
    the base tables' keys are uniform by construction, so skew claims
    were previously unmeasured.  The draw is a deterministic hash of
    the replicated event_id (rerunning the builder reproduces the
    fixture bit-for-bit); every other column (and every other table,
    symlinked) is untouched, so the same queries run unchanged."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    stride = _ID_STRIDE
    con.execute(
        f"""
COPY (
  SELECT event_id + r.r * {stride} AS event_id, ts,
         CAST(CASE WHEN hash(event_id + r.r * {stride}) % 100 < 35 THEN 1
              WHEN hash(event_id + r.r * {stride}) % 100 < 50 THEN 2
              ELSE 3 + abs(hash(event_id + r.r * {stride} + 7919)) % 9997
         END AS BIGINT) AS user_id,
         event_type, value, props
  FROM read_parquet('{base}/events.parquet'), range({n}) r(r)
) TO '{out}/events.parquet' (FORMAT PARQUET)
"""
    )
    n_rows, top = con.execute(
        f"""SELECT SUM(c), MAX(c) FROM (SELECT COUNT(*) AS c
               FROM read_parquet('{out}/events.parquet') GROUP BY user_id)"""
    ).fetchone()
    print(f"wrote {out}/events.parquet x{n} ({n_rows} rows, "
          f"hottest user holds {top} = {top/n_rows:.0%})")
    for f in Path(base).glob("*.parquet"):
        if f.stem == "events":
            continue
        dst = Path(out) / f.name
        if not (dst.is_symlink() or dst.exists()):
            os.symlink(f.resolve(), dst)


if __name__ == "__main__":
    args = [
        a
        for a in sys.argv[1:]
        if a not in ("--relational", "--skew", "--events")
    ]
    base, out, n = args[0], args[1], int(args[2])
    if "--skew" in sys.argv:
        build_skew(base, out, n)
    elif "--events" in sys.argv:
        build_events(base, out, n)
    elif "--relational" in sys.argv:
        build_relational(base, out, n)
    else:
        build(base, out, n)
