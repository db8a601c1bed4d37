"""Generation-pointer commit + tombstone DELETE — the storeops layer.

The crash matrix the module promises (no kill point leaves a reader
without a complete table) is pinned here by fault injection at each
commit step, on the generic layer AND on all four index compactors
(LSH bands, SimHash chunks, inverted postings, IVF postings+pqcodes).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark import storeops
from another_map_reduce_spark.storeops import (
    append_tombstones,
    commit_generation,
    compact_table,
    current_generation,
    gc_stale_generations,
    read_table,
    reset_table,
    resolve_table,
    tombstone_path,
)


def _rows(spark, table):
    return {tuple(r) for r in read_table(spark, table).collect()}


def _mk(spark, tmp_path, n=20):
    table = str(tmp_path / "tbl")
    spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").parquet(table)
    return table


def test_legacy_then_generations_roundtrip(spark, tmp_path):
    """Pre-pointer layout resolves to itself; each compact moves the
    live generation without changing a row."""
    table = _mk(spark, tmp_path)
    assert resolve_table(table) == table
    assert current_generation(table) == 0
    before = _rows(spark, table)

    compact_table(spark, table)
    assert current_generation(table) == 1
    assert resolve_table(table).endswith("__gen_000001")
    assert _rows(spark, table) == before
    # legacy dir was GC'd after the flip
    assert not os.path.isdir(table)

    compact_table(spark, table)
    assert current_generation(table) == 2
    assert _rows(spark, table) == before
    assert not os.path.isdir(f"{table}__gen_000001")


def test_append_lands_in_live_generation(spark, tmp_path):
    table = _mk(spark, tmp_path, n=10)
    compact_table(spark, table)
    extra = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    extra.write.mode("append").parquet(resolve_table(table))
    assert len(_rows(spark, table)) == 15


def test_crash_during_generation_write(spark, tmp_path):
    """Kill point 1: the new generation is half-written when the
    process dies.  The pointer still names the old data; readers are
    untouched; the next compact overwrites the orphan and succeeds."""
    table = _mk(spark, tmp_path)
    before = _rows(spark, table)

    def _boom(dest: str) -> None:
        os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "part-garbage"), "w") as fh:
            fh.write("half-written")
        raise RuntimeError("injected crash mid-write")

    with pytest.raises(RuntimeError, match="injected"):
        commit_generation(table, _boom)
    assert current_generation(table) == 0  # pointer never flipped
    assert _rows(spark, table) == before  # reader consistent
    # recovery: a plain compact rewrites gen 1 from scratch
    compact_table(spark, table)
    assert current_generation(table) == 1
    assert _rows(spark, table) == before


def test_crash_after_flip_before_gc(spark, tmp_path, monkeypatch):
    """Kill point 2: pointer flipped, GC never ran.  Readers see the
    new (complete) generation; stale dirs are swept by the next GC
    without touching live data."""
    table = _mk(spark, tmp_path)
    before = _rows(spark, table)
    monkeypatch.setattr(
        storeops, "gc_stale_generations", lambda t, keep=0: None
    )
    compact_table(spark, table)
    monkeypatch.undo()
    assert current_generation(table) == 1
    assert os.path.isdir(table)  # stale legacy dir survived the crash
    assert _rows(spark, table) == before  # reader consistent anyway
    gc_stale_generations(table)
    assert not os.path.isdir(table)
    assert _rows(spark, table) == before


def test_tombstone_delete_then_compact_excises(spark, tmp_path):
    table = _mk(spark, tmp_path)
    doomed = spark.range(5).select(F.col("id").alias("k"))
    append_tombstones(doomed, table, "k")
    # logical delete is immediate
    live = {r.k for r in read_table(spark, table, id_col="k").collect()}
    assert live == set(range(5, 20))
    # raw read still has the rows (they are only tombstoned)
    assert len(_rows(spark, table)) == 20
    compact_table(spark, table, id_col="k")
    # physical excision + tombstones cleared
    assert not os.path.isdir(tombstone_path(table))
    assert {r.k for r in spark.read.parquet(resolve_table(table)).collect()} \
        == set(range(5, 20))


def test_tombstones_for_absent_ids_are_noops(spark, tmp_path):
    """Crash between pointer flip and tombstone clear leaves tombstones
    naming already-excised rows — re-applying them must change
    nothing (and deleting never-present ids is equally harmless)."""
    table = _mk(spark, tmp_path)
    doomed = spark.range(5).select(F.col("id").alias("k"))
    append_tombstones(doomed, table, "k")
    compact_table(spark, table, id_col="k")
    # simulate the crash: re-append the same (now absent) ids + bogus ones
    append_tombstones(doomed, table, "k")
    append_tombstones(
        spark.range(100, 105).select(F.col("id").alias("k")), table, "k"
    )
    live = {r.k for r in read_table(spark, table, id_col="k").collect()}
    assert live == set(range(5, 20))
    compact_table(spark, table, id_col="k")
    assert {r.k for r in read_table(spark, table, id_col="k").collect()} \
        == set(range(5, 20))


def test_reset_table_unshadows_rebuild(spark, tmp_path):
    table = _mk(spark, tmp_path)
    compact_table(spark, table)
    assert current_generation(table) == 1
    reset_table(table)
    assert current_generation(table) == 0
    # rebuild into the legacy path is visible again
    spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").parquet(table)
    assert len(_rows(spark, table)) == 3


# ---------------------------------------------------------------------------
# Kill-point probe-parity on all four real index compactors
# ---------------------------------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lsh_compactor_killpoints_keep_probe_consistent(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash mid-write and crash before GC around lsh_compact_index:
    the incremental probe answer never changes at any kill point, and
    after recovery the tombstoned doc is gone."""
    from another_map_reduce_spark.operators.dedup import (
        incremental_minhash_pairs,
        lsh_band_index,
        lsh_compact_index,
        lsh_delete_docs,
        read_lsh_index,
    )

    docs = _docs(spark, sf_dir)
    hist = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "bands")
    lsh_band_index(hist).write.mode("overwrite").parquet(path)

    def probe():
        return {
            (r.new_doc, r.dup_of, round(r.jac, 9))
            for r in incremental_minhash_pairs(
                hist, delta, read_lsh_index(spark, path)
            ).collect()
        }

    base = probe()
    assert base  # non-vacuous fixture

    # delete the dup_of docs of ONE probe hit → that pair must vanish
    victim = sorted(base)[0][1]
    lsh_delete_docs(path, spark.createDataFrame([(victim,)], "doc long"))
    after_delete = probe()
    assert all(d != victim for (_, d, _) in after_delete)

    # kill point 1: crash during the compaction's generation write
    real_commit = storeops.commit_generation

    def _dying_commit(table, write_fn, keep_generations=0):
        raise RuntimeError("injected crash before any write")

    monkeypatch.setattr(storeops, "commit_generation", _dying_commit)
    with pytest.raises(RuntimeError, match="injected"):
        lsh_compact_index(spark, path, target_files=2)
    monkeypatch.undo()
    assert probe() == after_delete  # logical delete still in force

    # kill point 2: pointer flipped, GC + tombstone clear skipped
    monkeypatch.setattr(
        storeops, "gc_stale_generations", lambda t, keep=0: None
    )
    import shutil as _shutil

    real_rmtree = _shutil.rmtree
    monkeypatch.setattr(
        storeops.shutil,
        "rmtree",
        lambda p, **kw: None
        if p == tombstone_path(path)
        else real_rmtree(p, **kw),
    )
    lsh_compact_index(spark, path, target_files=2)
    monkeypatch.undo()
    assert probe() == after_delete  # stale tombstones are no-ops
    # recovery compact: sweeps stale state, physical rows excised
    lsh_compact_index(spark, path, target_files=2)
    assert probe() == after_delete
    raw = spark.read.parquet(resolve_table(path))
    assert raw.where(F.col("doc") == victim).isEmpty()
    assert not os.path.isdir(tombstone_path(path))


def test_simhash_and_postings_delete_compact_parity(spark, sf_dir, tmp_path):
    """SimHash chunk index + containment inverted postings: probe after
    delete+compact equals a rebuild over the survivors."""
    from another_map_reduce_spark.operators.dedup import (
        containment_from_shingles,
        incremental_simhash_pairs,
        postings_compact_index,
        postings_delete_docs,
        read_postings_index,
        read_simhash_index,
        shingle_docs,
        simhash_chunks,
        simhash_compact_index,
        simhash_delete_docs,
        simhash_frame,
    )

    docs = _docs(spark, sf_dir)
    hist = docs.where(F.col("doc_id") % 10 != 0)
    survivors = docs.where(
        (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 20 != 5)
    )
    doomed = docs.where(F.col("doc_id") % 20 == 5)
    delta = docs.where(F.col("doc_id") % 10 == 0)

    # --- SimHash chunk index
    spath = str(tmp_path / "chunks")
    simhash_chunks(simhash_frame(hist)).write.mode("overwrite").parquet(spath)
    simhash_delete_docs(spath, doomed.select(F.col("doc_id").alias("doc")))
    simhash_compact_index(spark, spath, target_files=2)

    def sim_pairs(index):
        return {
            (r.new_doc, r.dup_of, r.hamming)
            for r in incremental_simhash_pairs(delta, index).collect()
        }

    got = sim_pairs(read_simhash_index(spark, spath))
    want = sim_pairs(simhash_chunks(simhash_frame(survivors)))
    assert got == want
    raw = spark.read.parquet(resolve_table(spath))
    assert raw.join(
        doomed.select(F.col("doc_id").alias("doc")), "doc", "left_semi"
    ).isEmpty()

    # --- containment inverted postings
    ppath = str(tmp_path / "postings")
    (
        shingle_docs(hist, "text", "doc_id", 3)
        .select(
            F.col("doc").alias("src_doc"),
            F.explode("shingles").alias("shingle"),
        )
        .write.mode("overwrite")
        .parquet(ppath)
    )
    postings_delete_docs(ppath, doomed.select(F.col("doc_id").alias("src_doc")))
    postings_compact_index(spark, ppath)
    dsh = shingle_docs(delta, "text", "doc_id", 3).select(
        F.col("doc").alias("new_doc"), F.explode("shingles").alias("shingle")
    )

    def cont_pairs(index):
        return {
            (r.new_doc, r.src_doc, round(r.containment, 9))
            for r in containment_from_shingles(
                dsh, index, threshold=0.5
            ).collect()
        }

    got = cont_pairs(read_postings_index(spark, ppath))
    want = cont_pairs(
        shingle_docs(survivors, "text", "doc_id", 3).select(
            F.col("doc").alias("src_doc"),
            F.explode("shingles").alias("shingle"),
        )
    )
    assert got == want


def test_ivf_pq_delete_compact_parity(spark, sf_dir, tmp_path):
    """IVF+PQ: delete+compact ≡ rebuild-from-survivors in the lossless
    probe regime, on BOTH layouts (postings excised, pqcodes excised),
    and the logical-delete probe (pre-compact) already agrees."""
    from another_map_reduce_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_check_consistency,
        ivf_pq_compact,
        ivf_pq_delete_vectors,
        ivf_pq_probe_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 400
    )
    queries = emb.where(F.col("vec_id") < 10)
    doomed = emb.where(F.col("vec_id") % 20 == 5).select("vec_id")

    path = str(tmp_path / "pq")
    build_ivf_pq_index(emb, path, num_cells=4, m_sub=8, k_codes=8,
                       train_iters=1)
    ivf_pq_delete_vectors(path, doomed)

    def probe():
        return [
            (r.qid, r.rank, r.cid)
            for r in ivf_pq_probe_topk(
                spark, path, queries, k=5, nprobe=4, rerank=None
            ).collect()
        ]

    logical = probe()
    assert all(c % 20 != 5 for (_, _, c) in logical)
    ivf_pq_compact(spark, path)
    assert probe() == logical
    assert ivf_pq_check_consistency(spark, path).isEmpty()
    for sub in ("postings", "pqcodes"):
        raw = spark.read.parquet(resolve_table(f"{path}/{sub}"))
        assert raw.where(F.col("cid") % 20 == 5).isEmpty()

    # rebuild over survivors with the SAME models must probe identically
    import shutil

    rpath = str(tmp_path / "pq_rebuilt")
    os.makedirs(rpath)
    shutil.copytree(f"{path}/centroids", f"{rpath}/centroids")
    shutil.copytree(f"{path}/codebooks", f"{rpath}/codebooks")
    from another_map_reduce_spark.operators.similarity import (
        pq_encode,
        read_pq_codebooks,
        top_cells,
    )

    cents = [
        [float(x) for x in r.centroid]
        for r in spark.read.parquet(f"{path}/centroids")
        .orderBy("cell")
        .collect()
    ]
    cbs = read_pq_codebooks(spark, path)
    survivors = emb.where(F.col("vec_id") % 20 != 5)
    posts = survivors.select(
        F.element_at(top_cells(F.col("embedding"), cents, 1), 1).alias(
            "cell"
        ),
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
    )
    posts.repartition("cell").write.partitionBy("cell").parquet(
        f"{rpath}/postings"
    )
    posts.select(
        "cell", "cid", pq_encode(F.col("cvec"), cbs).alias("codes")
    ).repartition("cell").write.partitionBy("cell").parquet(
        f"{rpath}/pqcodes"
    )
    want = [
        (r.qid, r.rank, r.cid)
        for r in ivf_pq_probe_topk(
            spark, rpath, queries, k=5, nprobe=4, rerank=None
        ).collect()
    ]
    assert logical == want


def test_gc_relative_path_preserves_live_generation(tmp_path, monkeypatch):
    """Regression (r10 review): with a RELATIVE table path, the GC's
    live-generation guard must compare directory names, not joined
    paths — a path-equality guard deleted the just-committed live
    generation.  Pure-Python I/O (Spark resolves relative paths
    against the JVM cwd, but the GC bug is filesystem logic)."""
    monkeypatch.chdir(tmp_path)
    table = "reltbl"
    os.makedirs(table)
    with open(os.path.join(table, "part-0"), "w") as fh:
        fh.write("legacy")

    def _write(dest: str) -> None:
        os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "part-0"), "w") as fh:
            fh.write("gen data")

    commit_generation(table, _write)
    assert current_generation(table) == 1
    live = resolve_table(table)
    # the live generation must SURVIVE the GC that ran inside commit
    assert os.path.isdir(live), "GC deleted the live generation"
    assert open(os.path.join(live, "part-0")).read() == "gen data"
    assert not os.path.isdir(table)  # legacy dir was the stale one


def test_consistency_checker_catches_compensating_orphans(spark, sf_dir, tmp_path):
    """Regression (r10 review): per-cell COUNT equality lets a
    code-less posting and a posting-less code in the SAME cell cancel
    out; the checker must be a (cell, cid) bijection test."""
    from another_map_reduce_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_check_consistency,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 100
    )
    path = str(tmp_path / "pq")
    build_ivf_pq_index(emb, path, num_cells=2, m_sub=8, k_codes=8,
                       train_iters=1)
    assert ivf_pq_check_consistency(spark, path).isEmpty()
    # fabricate compensating orphans in one cell: swap one cid in the
    # pqcodes table for an id that exists nowhere in postings
    codes = spark.read.parquet(f"{path}/pqcodes")
    some = codes.limit(1).collect()[0]
    patched = codes.withColumn(
        "cid",
        F.when(F.col("cid") == some.cid, F.lit(999_999)).otherwise(
            F.col("cid")
        ),
    ).localCheckpoint(eager=True)
    import shutil

    shutil.rmtree(f"{path}/pqcodes")
    patched.repartition("cell").write.partitionBy("cell").parquet(
        f"{path}/pqcodes"
    )
    bad = ivf_pq_check_consistency(spark, path).collect()
    assert len(bad) >= 1
    assert any(
        r.n_missing_pqcodes >= 1 and r.n_missing_postings >= 1 for r in bad
    )


def test_retention_and_time_travel(spark, tmp_path):
    """keep_generations retains old snapshots for time-travel reads;
    a generation=G read is the committed state AS OF its compaction —
    rows deleted afterwards are still visible in the old snapshot (the
    takedown-audit view), and snapshots past the retention window
    expire."""
    table = _mk(spark, tmp_path)
    before = _rows(spark, table)
    compact_table(spark, table, keep_generations=1)  # gen 1
    # delete 0..4, compact again retaining one old snapshot
    append_tombstones(
        spark.range(5).select(F.col("id").alias("k")), table, "k"
    )
    compact_table(spark, table, id_col="k", keep_generations=1)  # gen 2
    assert current_generation(table) == 2
    # live view: survivors only
    assert {r.k for r in read_table(spark, table, id_col="k").collect()} \
        == set(range(5, 20))
    # time travel to gen 1: the pre-takedown snapshot, deleted rows intact
    old = {
        tuple(r)
        for r in read_table(spark, table, generation=1).collect()
    }
    assert old == before
    # a third compact with keep=1 expires gen 1
    compact_table(spark, table, id_col="k", keep_generations=1)  # gen 3
    assert current_generation(table) == 3
    with pytest.raises(FileNotFoundError, match="generation 1"):
        read_table(spark, table, generation=1)
    # gen 2 (post-takedown) is the retained snapshot
    assert {r.k for r in read_table(spark, table, generation=2).collect()} \
        == set(range(5, 20))
    # default retention (0) still GCs everything stale
    compact_table(spark, table, id_col="k")
    assert not os.path.isdir(f"{str(tmp_path / 'tbl')}__gen_000002")


def test_model_based_random_lifecycle(spark, tmp_path):
    """Model-based check: a seeded random walk of append / delete /
    compact(keep∈{0,1}) operations against a pure-Python reference
    model — after EVERY op the live view equals the model, and after
    every compact the retained snapshot equals the model as-of the
    previous compact."""
    import random

    rng = random.Random(20260815)
    table = str(tmp_path / "fuzz")
    model: set[int] = set(range(10))       # live view (tombstones applied)
    raw_model: set[int] = set(model)       # physical rows of the live gen
    spark.createDataFrame(
        [(k,) for k in sorted(model)], "k long"
    ).write.mode("overwrite").parquet(table)
    next_k = 10
    # snapshot[G] = raw rows of gen G frozen when G+1 committed
    snapshots: dict[int, set[int]] = {}

    def live() -> set[int]:
        return {r.k for r in read_table(spark, table, id_col="k").collect()}

    for step in range(18):
        op = rng.choice(["append", "delete", "delete", "compact"])
        if op == "append":
            batch = list(range(next_k, next_k + rng.randint(1, 4)))
            next_k += len(batch)
            spark.createDataFrame(
                [(k,) for k in batch], "k long"
            ).write.mode("append").parquet(resolve_table(table))
            model |= set(batch)
            raw_model |= set(batch)
        elif op == "delete":
            pool = sorted(model) or [0]
            doomed = set(rng.sample(pool, min(2, len(pool))))
            doomed.add(next_k + 1000 + step)  # an absent id — must no-op
            append_tombstones(
                spark.createDataFrame([(k,) for k in sorted(doomed)], "k long"),
                table,
                "k",
            )
            model -= doomed  # logical only: raw rows stay until compact
        else:
            keep = rng.randint(0, 1)
            gen_before = current_generation(table)
            # gen_before's dir freezes NOW, holding its raw rows
            snapshots[gen_before] = set(raw_model)
            compact_table(spark, table, id_col="k", keep_generations=keep)
            raw_model = set(model)  # excision happened
            if keep == 1 and gen_before > 0:
                old = {
                    r.k
                    for r in read_table(
                        spark, table, generation=gen_before
                    ).collect()
                }
                assert old == snapshots[gen_before], f"step {step}"
        assert live() == model, f"step {step} op {op}"
    # end state: one more compact fully reconciles disk with the model
    compact_table(spark, table, id_col="k")
    assert {
        r.k for r in spark.read.parquet(resolve_table(table)).collect()
    } == model


def test_ivf_pq_append_killpoints_atomic_pair(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The r11 delta-group append: at EVERY kill point of the paired
    postings+pqcodes append, the lossless probe answer is unchanged
    and ivf_pq_check_consistency is EMPTY (a no-op assertion — the
    r10 crash window where postings rows had no PQ code is closed);
    a crashed append can simply be re-run."""
    from another_map_reduce_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_append_vectors,
        ivf_pq_check_consistency,
        ivf_pq_compact,
        ivf_pq_probe_topk,
        pq_encode,
        read_pq_codebooks,
        top_cells,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 300
    )
    hist = emb.where(F.col("vec_id") >= 50)
    delta = emb.where(F.col("vec_id") < 50)
    queries = emb.where(F.col("vec_id").between(100, 109))
    path = str(tmp_path / "pq")
    build_ivf_pq_index(hist, path, num_cells=4, m_sub=8, k_codes=8,
                       train_iters=1)

    def probe():
        return [
            (r.qid, r.rank, r.cid)
            for r in ivf_pq_probe_topk(
                spark, path, queries, k=5, nprobe=4, rerank=None
            ).collect()
        ]

    def consistent():
        return ivf_pq_check_consistency(spark, path).isEmpty()

    base = probe()
    assert consistent()

    cents = [
        [float(x) for x in r.centroid]
        for r in spark.read.parquet(f"{path}/centroids")
        .orderBy("cell")
        .collect()
    ]
    cbs = read_pq_codebooks(spark, path)
    from another_map_reduce_spark.functions.vectors import l2_norm

    rows = delta.select(
        F.element_at(top_cells(F.col("embedding"), cents, 1), 1).alias(
            "cell"
        ),
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        # base postings carry stored norms (r12) — the hand-staged
        # delta must match the member schema for read_member's union
        l2_norm(F.col("embedding")).alias("cnorm"),
    )
    codes = rows.select(
        "cell", "cid", pq_encode(F.col("cvec"), cbs).alias("codes")
    )

    def _w(df):
        return lambda dest: (
            df.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(dest)
        )

    # kill point 1: crash BETWEEN the two member writes (second
    # member's staging write dies) — nothing became visible
    def _dying(dest):
        raise RuntimeError("injected crash in second member write")

    with pytest.raises(RuntimeError, match="injected"):
        storeops.commit_delta(
            path, {"postings": _w(rows), "pqcodes": _dying}
        )
    assert probe() == base
    assert consistent()

    # kill point 2: both members staged + APPLIES written, crash at
    # the commit rename — nothing became visible
    monkeypatch.setattr(
        storeops.os,
        "rename",
        lambda *a, **k: (_ for _ in ()).throw(
            OSError("injected crash at commit rename")
        ),
    )
    with pytest.raises(OSError, match="injected"):
        ivf_pq_append_vectors(spark, path, delta)
    monkeypatch.undo()
    assert probe() == base
    assert consistent()

    # recovery: RE-RUN the crashed append verbatim (nothing of it was
    # visible, so no duplication) — both members appear atomically
    ivf_pq_append_vectors(spark, path, delta)
    appended = probe()
    assert appended != base  # delta ids now probe-visible
    assert {c for (_, _, c) in appended} & set(range(50))
    assert consistent()

    # kill point 3: crash BETWEEN the two member compactions —
    # postings folded+flipped (its deltas expired), pqcodes still on
    # base+delta; every reader sees each row exactly once
    real_cm = storeops.compact_member
    calls = {"n": 0}

    def _dying_cm(sp, group, member, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before second compact")
        return real_cm(sp, group, member, **kw)

    monkeypatch.setattr(storeops, "compact_member", _dying_cm)
    import another_map_reduce_spark.operators.similarity as sim

    monkeypatch.setattr(
        sim, "compact_member", _dying_cm, raising=False
    )
    with pytest.raises(RuntimeError, match="injected"):
        ivf_pq_compact(spark, path)
    monkeypatch.undo()
    assert probe() == appended
    assert consistent()

    # recovery compact: folds the remaining member, GCs consumed
    # deltas and abandoned staging dirs.  The crashed kill-point
    # appends left fresh .tmp_delta_* wreckage, which GC's age gate
    # (defence-in-depth for a cross-process GC-vs-append race, ADVICE
    # r11) deliberately protects — backdate it past the gate so this
    # test exercises the wreckage collection itself.
    import time as _time

    droot = os.path.join(path, "deltas")
    for n in os.listdir(droot):
        if n.startswith(".tmp_delta_"):
            old = _time.time() - 2 * storeops._TMP_DELTA_GC_AGE_SEC
            os.utime(os.path.join(droot, n), (old, old))
    ivf_pq_compact(spark, path)
    assert probe() == appended
    assert consistent()
    leftover = [
        n
        for n in os.listdir(os.path.join(path, "deltas"))
        if n.startswith("delta_") or n.startswith(".tmp_delta_")
    ] if os.path.isdir(os.path.join(path, "deltas")) else []
    assert leftover == []
