"""Generate a GENUINE sf1 corpus (non-replicated) for the full gate.

The driver ships sf0.001/0.01/0.1; the scale curves above that were
replica-based (tools/make_scale_data.py), which preserves workload
shape but is still N copies of the same 0.1 draw.  This tool draws a
fresh, deterministic (numpy seed 42) corpus at 10x sf0.1 row counts
with the SAME schema and the same value domains as the driver tables
(domains probed from sf0.1 and recorded inline below), so every
registered query and its DuckDB oracle run unmodified — the bench
compares Spark vs DuckDB on the SAME files, so generator fidelity to
the driver's exact RNG is not required, only domain/shape fidelity:

- region/nation: copied verbatim (bounded dimensions).
- customer/supplier/part: 10x rows, TPC-H-ish name formulas
  (Customer#%09d, Brand#1..25, p_retailprice = 900 + key/10).
- orders 1.5M: uniform dates 1995-01-01..2001-08-01 (midnight
  timestamps, as shipped), status/priority uniform.
- lineitem ~6M: per-order line count ~ Poisson(3)+1 (matches the
  observed 1..17 fan-out, mean 4), shipdate independent uniform
  1995-01-02..2001-11-04, qty 1..50, discount 0..0.10 step 0.01,
  tax 0..0.08, extendedprice uniform 900..105000.
- events 1M: Jan-2024 microsecond timestamps (written as
  TIMESTAMP(NANOS) like the driver's file when pyarrow 2.6 allows),
  15k users, 5 uniform event types, exponential value clipped at
  560, props = {"k": 0..99}.
- documents 50k: word salad over the BASE table's own empirical
  vocabulary EXPANDED 10x with suffix variants (word~1..word~9;
  Gopher stopwords stay unsuffixed/shared — the make_scale_data.py
  trick, applied per-word instead of per-replica), so per-shingle
  document frequency stays at the sf0.1 level and pair-candidate
  work scales LINEARLY like a Heaps'-law corpus would — 10x docs on
  the unexpanded vocabulary would square the dedup oracles' pair
  count instead.  Length/lang/source distributions empirical from
  the base table; ~4.5% planted near-dups (prefix-preserving
  mutation of an earlier doc — the observed plant rate).
- embeddings 20k: unit-norm Gaussian float32[64], labels 0..9
  (the base table has no label clustering and no planted near-dups;
  neither does this draw).

Usage: python tools/make_sf1.py OUT_DIR [BASE_SF_DIR] [FACTOR]
  (FACTOR defaults to 10 = sf1; 30 cuts a genuine sf3)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
FACTOR = 10


def _write(out_dir: str, name: str, table: pa.Table, **kw) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"), **kw)
    print(f"  {name}: {table.num_rows} rows")


def _midnight_ts(rng, n, lo: str, hi: str) -> pa.Array:
    lo_d = np.datetime64(lo)
    days = int((np.datetime64(hi) - lo_d) / np.timedelta64(1, "D"))
    picks = lo_d + rng.integers(0, days + 1, n).astype("timedelta64[D]")
    return pa.array(picks.astype("datetime64[us]"), pa.timestamp("us"))


def main() -> None:
    global FACTOR
    out_dir = sys.argv[1]
    base = sys.argv[2] if len(sys.argv) > 2 else BASE
    if len(sys.argv) > 3:
        FACTOR = int(sys.argv[3])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    con = duckdb.connect()

    # --- bounded dimensions: copy verbatim ---
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{base}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")

    n_cust, n_supp, n_part = 15_000 * FACTOR, 1_000 * FACTOR, 20_000 * FACTOR
    n_ord, n_ev = 150_000 * FACTOR, 100_000 * FACTOR
    n_doc, n_emb = 5_000 * FACTOR, 2_000 * FACTOR

    # --- customer ---
    ck = np.arange(n_cust, dtype=np.int64)
    _write(out_dir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"], n_cust)),
    }))

    # --- supplier ---
    sk = np.arange(n_supp, dtype=np.int64)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # --- part ---
    pk = np.arange(n_part, dtype=np.int64)
    adjs = ["large", "hot", "blue", "old", "cold", "small", "red",
            "green", "new", "dim"]
    nouns = ["ring", "bolt", "plate", "gear", "wheel", "pin", "rod",
             "cap", "nut", "disk"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array([
            f"{adjs[a]} {nouns[b]}"
            for a, b in zip(rng.integers(0, 10, n_part),
                            rng.integers(0, 10, n_part))
        ]),
        "p_brand": pa.array([
            f"Brand#{b}" for b in rng.integers(1, 26, n_part)
        ]),
        "p_type": pa.array(rng.choice(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
             "STANDARD"], n_part)),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + pk / 10.0, 2),
    }))

    # --- orders ---
    ok = np.arange(n_ord, dtype=np.int64)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _midnight_ts(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], n_ord)),
    }))

    # --- lineitem ---
    fan = rng.poisson(3.0, n_ord) + 1
    lok = np.repeat(ok, fan)
    n_li = len(lok)
    lineno = (np.arange(n_li) - np.repeat(
        np.concatenate(([0], np.cumsum(fan)[:-1])), fan) + 1
    ).astype(np.int32)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lineno,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": _midnight_ts(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    # --- events (TIMESTAMP(NANOS) like the driver's file) ---
    lo = np.datetime64("2024-01-01T00:00:00")
    span_us = int((np.datetime64("2024-01-31T00:00:00") - lo)
                  / np.timedelta64(1, "us"))
    ts = lo + rng.integers(0, span_us, n_ev).astype("timedelta64[us]")
    ev = pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ts.astype("datetime64[ns]"), pa.timestamp("ns")),
        "user_id": rng.integers(0, 1_500 * FACTOR, n_ev),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], n_ev)),
        "value": np.round(np.minimum(
            rng.exponential(50.0, n_ev), 560.0), 6),
        "props": pa.array([
            json.dumps({"k": int(k)})
            for k in rng.integers(0, 100, n_ev)
        ]),
    })
    _write(out_dir, "events", ev, version="2.6",
           coerce_timestamps=None)

    # --- documents: empirical vocab/lang/source/length from base ---
    from another_map_reduce_spark.operators.quality import (
        GOPHER_STOPWORDS,
    )

    rows = con.execute(
        f"SELECT text, lang, source FROM '{base}/documents.parquet'"
    ).fetchall()
    base_vocab = sorted({w for t, _, _ in rows for w in t.split()})
    stop = set(GOPHER_STOPWORDS)
    vocab = [w for w in base_vocab if w.lower() in stop]
    for w in base_vocab:
        if w.lower() in stop:
            continue
        vocab.append(w)
        vocab.extend(f"{w}~{k}" for k in range(1, FACTOR))
    langs, lweights = np.unique([r[1] for r in rows], return_counts=True)
    sources = sorted({r[2] for r in rows})
    lens = np.array([len(t.split()) for t, _, _ in rows])
    texts: list[str] = []
    for i in range(n_doc):
        if i >= 100 and rng.random() < 0.045:
            # planted near-dup: mutate the tail of an earlier doc
            src = texts[int(rng.integers(0, i))].split()
            keep = max(1, int(len(src) * 0.9))
            tail = [vocab[j] for j in rng.integers(0, len(vocab),
                                                   len(src) - keep)]
            texts.append(" ".join(src[:keep] + tail))
        else:
            L = int(lens[rng.integers(0, len(lens))])
            texts.append(" ".join(
                vocab[j] for j in rng.integers(0, len(vocab), L)))
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(langs, n_doc,
                                    p=lweights / lweights.sum())),
        "source": pa.array(rng.choice(sources, n_doc)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # --- embeddings ---
    V = rng.standard_normal((n_emb, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(V.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))
    print("done:", out_dir)


if __name__ == "__main__":
    main()
