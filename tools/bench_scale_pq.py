"""Scale curve for the IVF+PQ probe path (round 9).

The 100 TB claim under test (SCALE.md / similarity.build_ivf_pq_index):
the probe SCAN reads the pqcodes layout — m_sub small ints per vector
instead of d×4-byte floats — and touches the full-precision postings
only for the top-``rerank`` shortlist, so the per-query index IO drops
by the code-compression factor at equal (measured) recall.  Locally
the probe is CPU/scheduling-bound, so the honest artifacts are (a) the
ON-DISK bytes of the two layouts the alternative probes scan, (b) the
recall of the PQ probe vs the full-precision probe at the same nprobe,
and (c) wall times for both, which at fixture scale mostly price the
extra ADC window + rerank join rather than IO.

Setup per scale N ∈ {1, 3, 10, 30} over make_scale_data embedding
replicas (mirrors bench_scale_ann.py): history = vec_id % 10 ≠ 0
(~1800·N vectors), delta = the base replica's 200 vec_id % 10 = 0
vectors (fixed), num_cells = 8·N (constant inverted-list size),
nprobe = proportional (constant probed fraction), m_sub=16, k_codes=16,
codebooks + centroids trained on the 1/N sample (train_mod=N).
Ground truth for recall: full-precision probe of the same index at the
same nprobe (isolates the ADC+rerank loss from the IVF truncation
loss), plus the lossless full probe at ≤10× for absolute recall.

Usage: python tools/bench_scale_pq.py [dest.json]
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
    ("1x", "/root/testdata/sf0.1", 1),
    ("3x", "/tmp/scale3", 3),
    ("10x", "/tmp/scale10", 10),
    ("30x", "/tmp/scale30", 30),
]
RECALL_MAX_SCALE = 10
_ID_STRIDE = 10_000_000
RERANK = 100


def _tree_bytes(p: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(p)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    for _, d, n in SCALES:
        if n > 1 and not Path(f"{d}/embeddings.parquet").exists():
            subprocess.run(
                [
                    sys.executable,
                    str(Path(__file__).parent / "make_scale_data.py"),
                    "/root/testdata/sf0.1",
                    d,
                    str(n),
                ],
                check=True,
            )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_probe_topk,
        ivf_probe_topk,
        proportional_nprobe,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    out: dict = {
        "cpus": 32,
        "cells_per_x": 8,
        "m_sub": 16,
        "k_codes": 16,
        "rerank": RERANK,
        "scales": {},
    }
    for label, d, n in SCALES:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        hist = emb.where(F.col("vec_id") % 10 != 0)
        cells = 8 * n
        nprobe = proportional_nprobe(cells)
        path = f"/tmp/pq_scale_index_{label}"
        t0 = time.time()
        build_ivf_pq_index(
            hist, path, num_cells=cells, m_sub=16, k_codes=16,
            train_iters=1, train_mod=n,
        )
        build_s = round(time.time() - t0, 2)
        rec: dict = {
            "hist_rows": hist.count(),
            "cells": cells,
            "nprobe": nprobe,
            "build_sec": build_s,
            "pqcodes_bytes": _tree_bytes(f"{path}/pqcodes"),
            "postings_bytes": _tree_bytes(f"{path}/postings"),
        }

        def delta_frame():
            return spark.read.parquet(f"{d}/embeddings.parquet").where(
                (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < _ID_STRIDE)
            )

        # lossless ground truth (absolute recall), bounded scales only
        absolute: dict[int, set] = {}
        if n <= RECALL_MAX_SCALE:
            for r in ivf_pq_probe_topk(
                spark, path, delta_frame(), k=5, nprobe=cells, rerank=None
            ).collect():
                absolute.setdefault(r.qid, set()).add(r.cid)

        for regime, probe in (
            ("pq", lambda q: ivf_pq_probe_topk(
                spark, path, q, k=5, nprobe=nprobe, rerank=RERANK)),
            ("full_precision", lambda q: ivf_probe_topk(
                spark, path, q, k=5, nprobe=nprobe)),
        ):
            probe_s = None
            rows = []
            for _ in range(2):
                t1 = time.time()
                rows = probe(delta_frame()).collect()
                dt = round(time.time() - t1, 2)
                probe_s = dt if probe_s is None else min(probe_s, dt)
            sub: dict = {"probe_sec": probe_s, "probe_rows": len(rows)}
            if absolute:
                got: dict[int, set] = {}
                for r in rows:
                    got.setdefault(r.qid, set()).add(r.cid)
                recalls = [
                    len(absolute[q] & got.get(q, set())) / len(absolute[q])
                    for q in absolute
                ]
                sub["recall_vs_lossless"] = round(
                    sum(recalls) / len(recalls), 3
                )
            rec[regime] = sub
        out["scales"][label] = rec
        print(label, json.dumps(rec), file=sys.stderr)

    dest = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE_r9pq.json"
    Path(dest).write_text(json.dumps(out, indent=2))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
