"""Per-query PHASE timing registry (guide §1.5 — label your jobs).

Some timed rows bundle a one-time artifact/fixture build with the
recurring work the row exists to price (VERDICT r13 #4: ann_ivf_topk's
in-region centroid training, stream_buslog_backlog_drain's 861-segment
produce).  On a cold environment the build cost then READS as a probe/
drain regression in the driver's per-query seconds.  This module lets a
query label those spans: the ``phase`` context manager sets the Spark
job description for the span (so the UI groups its jobs) and records
the wall seconds into ``PHASES``; the bench harness drains the registry
after each timed invocation and publishes per-phase seconds beside the
per-query samples in BENCH_FULL (``queries_phases``).

Strictly observational: phases change NO result, cache NOTHING across
invocations (the registry is cleared per drain), and every span still
runs inside the bench's timed region — the phase seconds are a
decomposition of the recorded total, not an exclusion from it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import SparkSession

# query name -> {phase name -> cumulative seconds this invocation}
PHASES: dict[str, dict[str, float]] = {}


@contextmanager
def phase(spark: SparkSession, query: str, name: str):
    """Label + time one span of ``query``.  Re-entering the same phase
    name accumulates (e.g. the two produce tranches of the backlog
    drain sum into one ``produce`` figure)."""
    sc = spark.sparkContext
    prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(f"{query}: {name}")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sc.setJobDescription(prev)
        d = PHASES.setdefault(query, {})
        d[name] = round(d.get(name, 0.0) + (time.perf_counter() - t0), 3)


def drain(query: str) -> dict[str, float] | None:
    """Pop and return the phase record for one finished invocation
    (None when the query recorded no phases)."""
    return PHASES.pop(query, None)
