"""Connected components over an edge list — the pairs→clusters step of
near-dup deduplication.

The reference engine has no graph surface (its whole query capability is
count-by-key, `/root/reference/src/worker.rs:23-38`); this is an
[extension] operator: MinHash/SimHash/Jaccard emit near-dup PAIRS, but a
dedup pipeline needs CLUSTERS (keep one survivor per group of mutually-
similar documents, where similarity is transitively closed).

Algorithm: iterative min-label propagation, expressed as DataFrame ops —
each round every node adopts the minimum label among itself and its
neighbours; at convergence every node carries the minimum node id of its
component (a deterministic, engine-independent cluster id).

Scale design:
- one hash shuffle per round (the union+groupBy on node); the edge list
  is re-used as-is, so edges shuffle once per round but never grow.
- rounds = graph diameter.  Dedup-similarity graphs are overwhelmingly
  tiny dense clusters (diameter ≤ 3-4), so propagation converges in a
  handful of rounds; when ``max_iter`` rounds don't converge (an
  adversarially long chain), the loop FALLS BACK to the Kiveris et al.
  "Connected Components in MapReduce and Beyond" (2014) large-star /
  small-star alternation, which contracts any graph in O(log² n)
  rounds (O(log n) in practice) with the same one-shuffle-per-round
  shape — so pathological diameters degrade gracefully instead of
  raising.
- convergence is detected with a one-row aggregate per round: labels
  only ever DECREASE, so the global SUM(label) is strictly monotone and
  stalls exactly at the fixed point — no expensive old-vs-new anti-join.
- ONE action per round (AQE may split one action into several
  scheduler jobs; the saved quantity is the driver round-trip and
  the duplicate materialisation pass): the round's frame is marked
  ``localCheckpoint(eager=False)``, so the convergence aggregate both
  materialises the checkpoint blocks and computes the sum in a single
  action (eager checkpointing ran a separate materialisation action
  first, doubling the per-round driver round-trips).
- `localCheckpoint` truncates the lineage each round so the plan (and
  driver memory) stays O(1) in the number of iterations instead of
  growing a nested-union tree Catalyst would re-optimize every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _probe_count(df: DataFrame) -> int:
    """Row count of a lazily-checkpointed frame via ONE JVM RDD action,
    bypassing the Dataset count's per-round planning tax.

    ``df.count()`` on the round's checkpoint builds a fresh Aggregate
    over the LogicalRDD and runs it through Catalyst + AQE — a partial/
    final aggregate pair around an Exchange, i.e. TWO scheduler jobs
    plus adaptive re-planning, every round (measured r13: isolated COLD
    passes of the converted loops regressed bfs 26.4→32.6 s,
    sssp 7.9→16.4 s vs the eager-RDD-count r12 shape, VERDICT r13 #1).
    Counting the checkpoint's own InternalRow RDD instead costs one
    plain RDD action — per-partition counts summed on the driver, no
    exchange, no AQE — and still materialises the lazy localCheckpoint
    blocks, so the one-action-per-round discipline is kept.  Unlike
    ``df.rdd.count()`` (guide §1.4) nothing crosses the Python
    boundary: the count happens JVM-side.

    Only correct as a *probe* on frames whose plan is already a bare
    checkpoint scan (LogicalRDD): for real query plans the Dataset
    count's pruning/AQE is the better deal.
    """
    return df._jdf.queryExecution().toRdd().count()


def _sever_stats(df: DataFrame) -> DataFrame:
    """Re-root ``df`` on its (materialized) RDD with FRESH default
    statistics.  ``localCheckpoint`` truncates lineage but COPIES the
    origin plan's estimated statistics onto the LogicalRDD
    (``rewriteStatsAndConstraints``); under an iterative SELF-JOIN
    loop those estimates compound multiplicatively (a join's
    sizeInBytes is the product of its children's), so after ~a dozen
    rounds the stats are million-digit BigIntegers and PLANNING time
    — not execution — dominates every round (measured: the r11
    pointer-doubling loop froze with jstack showing 300+ s inside
    BigInteger.multiply under SizeInBytesOnlyStatsPlanVisitor).  The
    JVM-side ``createDataFrame(JavaRDD, schema)`` wrap keeps the
    materialized blocks and schema but drops the poisoned stats.
    Loops that only join the iterate against a FIXED frame grow stats
    linearly and don't need this — only self-joining iterations do."""
    jdf = df._jdf
    fresh = df.sparkSession._jsparkSession.createDataFrame(
        jdf.javaRDD(), jdf.schema()
    )
    return DataFrame(fresh, df.sparkSession)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it.

    Returns a DataFrame (node: long, component: long) covering every
    node that appears in at least one edge.  Deterministic: the
    component id is the component's minimum node id, independent of
    partitioning, iteration count, or engine.

    Falls back to the Kiveris large-star/small-star algorithm if
    ``max_iter`` propagation rounds don't converge (diameter >
    max_iter) rather than raising or silently returning a partial
    clustering.
    """
    # Checkpoint BEFORE symmetrising: the upstream edge pipeline (often
    # an expensive LSH/verify join) is evaluated exactly once; the
    # union's two branches then read the cached blocks.  Symmetrising
    # first made the eager checkpoint evaluate the upstream twice —
    # measured ~2× the LSH cost inside dedup_cc_clusters.
    base = edges.select(
        F.col(src).cast("long").alias("node"),
        F.col(dst).cast("long").alias("nbr"),
    ).localCheckpoint()
    sym = base.union(
        base.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
    )
    # eager=False throughout the loop: the convergence aggregate below
    # is the action that materialises each round's checkpoint blocks,
    # so every round costs exactly one driver action.
    labels = (
        sym.select("node").distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint(eager=False)
    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        msgs = sym.join(labels, "node").select(
            F.col("nbr").alias("node"), "lbl"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=False)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels.select("node", F.col("lbl").alias("component"))
        prev_sum = cur_sum
    return _kiveris_components(sym)


def _label_sum(labels: DataFrame):
    """Decimal SUM of the label column — the monotone convergence
    scalar (labels only decrease, so the sum stalls exactly at the
    fixed point).  One 1-row collect; the only driver-side data."""
    return labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]


def _kiveris_components(
    sym: DataFrame,
    max_rounds: int = 60,
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    O(log² n)-round fallback for graphs whose diameter defeats plain
    label propagation.

    Each operation is one groupBy shuffle over the edge list:

    - large-star: for every node u, link every STRICTLY LARGER
      neighbour to m(u) = min(Γ(u) ∪ {u}).  Keeps the graph connected
      while halving long chains.
    - small-star: orient edges large→small, link every smaller-or-self
      neighbour to the minimum.  Contracts stars onto their roots.

    At the fixed point the edge list is exactly {(v, root(v)) : v ≠
    root}; together with the isolated roots that is the (node,
    component) labelling.  Convergence is detected with the same
    monotone scalar trick as propagation: both operations only ever
    REPLACE an endpoint with a smaller one, so SUM over all edge
    endpoints is non-increasing and stalls iff the edge set is stable.

    ``sym`` must be the symmetrised (node, nbr) edge list with no
    self-loops required (they're harmless).  ``stats``, when given, is
    filled with {"rounds": r} — test instrumentation for the O(log n)
    round-count contract.
    """
    edges = sym.select(
        F.least("node", "nbr").alias("u"), F.greatest("node", "nbr").alias("v")
    ).where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=False)
    # Every node that ever appeared — needed at the end because star
    # contraction drops nodes that become isolated roots.
    all_nodes = sym.select("node").distinct().localCheckpoint()

    def endpoint_sum(e: DataFrame):
        return e.agg(
            F.sum(F.col("u").cast("decimal(38,0)"))
            + F.sum(F.col("v").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev = endpoint_sum(edges)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # ---- large-star: u is the centre, neighbours are both dirs.
        nbrs = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbrs.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v"))
        )
        # ---- small-star over the large-star output.  Checkpointed so
        # the groupBy and the join below both read cached blocks
        # instead of each re-deriving the large-star join; the two
        # output edges per star member — (min, member) and (min,
        # centre) — come from ONE join via explode, not a self-union
        # of two identical joins.
        oriented = large.select(
            F.greatest("u", "v").alias("c"), F.least("u", "v").alias("n")
        ).localCheckpoint(eager=False)
        sm = oriented.groupBy("c").agg(F.min("n").alias("m"))
        small = oriented.join(sm, "c").select(
            F.col("m").alias("u"),
            F.explode(F.array("n", "c")).alias("v"),
        )
        edges = (
            small.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = endpoint_sum(edges)
        if stats is not None:
            stats["rounds"] = rounds
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"kiveris_components: no convergence in {max_rounds} rounds"
        )
    # Fixed point: edges are (root, member) stars.  A member's root is
    # the MIN over its star edges; roots (and isolated nodes) label
    # themselves.
    member_root = edges.groupBy(F.col("v").alias("node")).agg(
        F.min("u").alias("component")
    )
    return (
        all_nodes.join(member_root, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def cluster_stats(components: DataFrame) -> DataFrame:
    """Per-cluster summary of a (node, component) assignment: size and
    the sorted member list (deterministic columns for oracle hashing)."""
    return (
        components.groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
        .orderBy("component")
    )


def triangle_stats(proj: DataFrame) -> DataFrame:
    """Triangle count, wedge count, and global clustering coefficient
    of an ORIENTED simple edge list ``(u, v)`` with u < v and no
    duplicates (the caller's contract — e.g. plans/analytics.py's
    hub-capped co-purchase projection).

    DEGREE-ORDERED node-iterator join: edges are re-oriented from the
    lower-(degree, node) endpoint to the higher, and a triangle is
    counted once as the oriented path x→y→z closed by x→z.  The
    orientation is the classic wedge-shrinking trick — every node's
    OUT-degree is bounded by O(√m) on any graph, so the e1⋈e2 wedge
    intermediate is Σ outdeg² ≪ Σ deg² even under heavy degree skew
    (measured 4.2→3.2 s on the sf0.1 co-purchase graph, and the gap
    widens exactly when hubs appear).  The oriented list is
    materialized once (localCheckpoint) and reused by all three join
    aliases; at cluster scale persist(DISK_ONLY) is the same lever.
    Wedges are Σ d(d−1)/2 over UNDIRECTED degrees (integer DIV,
    exact); 3T/W is one exactly-rounded double division, so the
    single output row is hash-comparable across engines.  The joins
    shuffle on x / (x,y); nothing requires a broadcast.
    """
    # The edge list feeds FOUR consumers (degrees, orientation, edge
    # count, and — through ori — the triangle join); without a
    # barrier each recomputes the caller's projection joins from the
    # scan (measured 50 exchanges at sf0.1).  One materialization of
    # the slim (u, v) pairs serves all of them.
    proj = proj.localCheckpoint(eager=True)
    deg = (
        proj.select(F.col("u").alias("n"))
        .unionAll(proj.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = (
        proj.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = ori.alias("e1"), ori.alias("e2"), ori.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.y") == F.col("e2.x"))
        .join(
            e3,
            (F.col("e3.x") == F.col("e1.x"))
            & (F.col("e3.y") == F.col("e2.y")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    wedge = deg.agg(
        F.expr("CAST(SUM(d * (d - 1)) DIV 2 AS BIGINT)").alias("w")
    )
    edges = proj.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        edges.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(wedge))
        .select(
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.col("w").alias("n_wedges"),
            F.round(F.lit(3.0) * F.col("t") / F.col("w"), 6).alias(
                "clustering"
            ),
        )
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """Multi-source BFS: label every node of the directed edge list
    ``edges`` (src, dst) with its minimum hop distance from any node
    of ``sources`` (one column ``node``), exploring at most
    ``max_hops`` levels.  Returns (node, d) for every REACHED node;
    callers union the unreached remainder themselves (they know the
    node universe, this operator doesn't).

    The frontier-expansion formulation — not per-round full
    relaxation: each level joins only the NEWLY reached frontier
    against the edge list, so total work is O(Σ frontier out-degree)
    = O(|E|) across the whole traversal, the same bound as a
    single-machine BFS.  Per level: one shuffle_hash join of the
    frontier against the src-partitioned cached edge blocks (the
    corpus-sized side is never re-shuffled — the pagerank discipline),
    one distinct on the discovered nodes, one anti-join against the
    settled set.  Each level is lazily checkpointed and materialised
    by its own convergence COUNT, so a level costs exactly one driver
    action (r13: the r12 shape paid two — an eager-checkpoint
    materialisation pass plus an isEmpty probe; merging them into
    a count-as-materialiser halves the per-level driver round-trips,
    the CC convergence-probe discipline).  Lineage stays O(1) in
    depth; an empty frontier short-circuits the loop.  [extension] —
    the reference has no graph surface.
    """
    edges = edges.repartition("src").localCheckpoint(eager=False)
    dist = (
        sources.select("node", F.lit(0).cast("long").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for level in range(1, max_hops + 1):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", "src").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(level).cast("long").alias("d"))
            .localCheckpoint(eager=False)
        )
        # One RDD action materialises the lazy checkpoint AND probes
        # (r14: _probe_count — no per-level Catalyst/AQE count plan).
        if _probe_count(nxt) == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return dist


def sssp_weighted(
    edges: DataFrame,
    sources: DataFrame,
    cap: int,
    max_iters: int | None = None,
) -> DataFrame:
    """Weighted single-source(-set) shortest paths over the directed
    edge list ``edges`` (src, dst, w — non-negative INTEGER weights),
    exploring only paths whose distance at every intermediate node is
    < ``cap``.  Returns (node, d) for every reached node; callers
    union the unreached remainder (the bfs_hops contract).

    Frontier-based Bellman–Ford (delta relaxation), the weighted
    sibling of bfs_hops: each round relaxes ONLY the nodes whose
    distance improved last round — one shuffle_hash join of the
    frontier against the src-partitioned cached edge blocks (the
    corpus-sized side is never re-shuffled), one grouped min per
    destination, one improvement join against the settled distances.
    Rounds are lazily checkpointed and materialised by the
    convergence count — one action per round, O(1) lineage, empty-
    frontier short-circuit — the bfs_hops/CC discipline.  Weights must be ≥ 1: only then does the
    ``d < cap`` guard bound both path length and round count, making
    the default ``max_iters = cap + 1`` sufficient for convergence
    (a zero-weight edge would allow improving paths longer than
    cap+1 hops).  Exhausting ``max_iters`` with a still-non-empty
    frontier therefore RAISES instead of silently returning
    non-converged distances.

    Integer distances keep the result ENGINE-EXACT (no float path-sum
    ordering concerns) — the registered query's recursive-CTE oracle
    replays the same guarded relaxation and must hash-match.
    [extension] — the reference has no graph surface.
    """
    if max_iters is None:
        max_iters = cap + 1
    edges = edges.repartition("src").localCheckpoint(eager=False)
    dist = (
        sources.select("node", F.lit(0).cast("long").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = dist
    converged = False
    for _ in range(max_iters):
        cand = (
            edges.join(
                frontier.where(F.col("d") < cap)
                .withColumnRenamed("node", "src")
                .hint("shuffle_hash"),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("d") + F.col("w")).cast("long").alias("nd"),
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(dist, "node", "left")
            .where(F.col("d").isNull() | (F.col("nd") < F.col("d")))
            .select("node", F.col("nd").alias("d"))
            .localCheckpoint(eager=False)
        )
        # One RDD action materialises the round's checkpoint and probes
        # convergence (r13 — was eager checkpoint + isEmpty, two actions,
        # plus an eager dist merge action; the merged dist is now lazy
        # and materialised by the NEXT round's probe.  r14: _probe_count
        # removes the per-round Catalyst/AQE count plan).
        if _probe_count(improved) == 0:
            converged = True
            break
        dist = (
            dist.join(
                improved.select("node", F.col("d").alias("nd")),
                "node",
                "full",
            )
            .select("node", F.coalesce("nd", "d").alias("d"))
            .localCheckpoint(eager=False)
        )
        frontier = improved
    if not converged and not frontier.where(F.col("d") < cap).isEmpty():
        raise RuntimeError(
            "sssp_weighted exhausted max_iters with a non-empty "
            "frontier — weights < 1 (or an undersized max_iters) "
            "would otherwise return silently non-converged distances"
        )
    return dist


def kcore_peel(
    edges: DataFrame, k: int, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Bounded k-core PEELING over a SYMMETRIZED edge list (src, dst):
    each round drops every node whose current degree is < k, then
    restricts the edge list to surviving endpoints — ``rounds``
    iterations of the standard k-core decomposition step (the fixpoint
    of which is the k-core; a bounded peel is the same computation cut
    after a fixed prefix, so two engines running the same ``rounds``
    agree whether or not the graph has converged).

    Returns (stats, final_edges): stats has one row per round —
    (round, n_alive, n_edges) with round 0 = the input graph — and
    final_edges is the surviving symmetrized edge list.

    Shape: per round one degree aggregation (the symmetric list makes
    degree a plain groupBy count) and two semi-joins, checkpointed so
    the per-round stats don't recompute the prefix.  r13: both the
    survivor set and the restricted edge list are LAZY checkpoints
    materialised by the counts the stats row needs anyway — two actions
    per round, with the degree aggregation computed ONCE (the r12
    shape eager-checkpointed the edges and re-ran the degree pipeline
    for the separate alive.count — three actions and the degree
    shuffle twice per round).  All counts are integers, so the
    recursive-free unrolled-CTE oracle hash-matches exactly.  Degeneracy note: peeling only CASCADES when removals
    drag survivors below k — hub-dominated graphs converge in one
    round; chain-like graphs peel end-in one round per step (the
    registered query uses per-customer order chains for that reason).
    [extension] — the reference has no graph surface.
    """
    spark = edges.sparkSession
    es = edges.localCheckpoint(eager=False)
    n0 = es.select("src").distinct().count()  # materialises es too
    m0 = _probe_count(es)
    stats = [(0, n0, m0)]
    for rnd in range(1, rounds + 1):
        deg = es.groupBy("src").agg(F.count("*").alias("c"))
        alive = (
            deg.where(F.col("c") >= k)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=False)
        )
        # action 1: degree pipeline, once (r14: RDD probe, no count plan)
        n_alive = _probe_count(alive)
        es = (
            es.join(
                alive.withColumnRenamed("node", "src"), "src", "semi"
            )
            .join(alive.withColumnRenamed("node", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        stats.append((rnd, n_alive, _probe_count(es)))  # action 2
    sdf = spark.createDataFrame(
        stats, "round long, n_alive long, n_edges long"
    ).orderBy("round")
    return sdf, es


def label_propagation(
    edges: DataFrame,
    iters: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al. 2007) over a SYMMETRIZED edge list — the standard next step
    past connected components: CC answers "which nodes touch at all",
    LPA finds densely-linked groups inside one component.

    Every node starts labelled with its own id; each round, every node
    adopts the label carried by the PLURALITY of its in-neighbours,
    ties broken by the MINIMUM label — the deterministic tie-break
    that makes a fixed-round run engine-exact (the CC/SSSP
    discipline), unlike the randomized asynchronous formulation.  A
    FIXED ``iters`` keeps the computation replayable by an
    unrolled-CTE oracle: both engines run the same rounds, so the
    result hash-matches whether or not the labelling has converged
    (synchronous LPA can 2-cycle on bipartite structure — a bounded
    prefix is the well-defined object, same contract as kcore_peel).

    Requires every node to appear as a destination (symmetrize first —
    then in-neighbourhood = neighbourhood and no keep-own-label branch
    is needed, keeping the oracle join exact).  Returns (node, label).

    Scale shape: per round, ONE shuffle_hash join of the node-sized
    label table against the src-partitioned cached edge blocks (the
    corpus-sized side never re-shuffles — the pagerank discipline),
    one grouped count on (dst, label), one node-partitioned window to
    pick the plurality label.  Rounds are lazily checkpointed (r13 —
    lineage still O(1) per round, but no per-round materialisation
    action: the caller's single action computes the chain once, each
    round's blocks cached by its checkpoint mark).  [extension] — the
    reference has no graph surface.
    """
    from pyspark.sql import Window

    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).repartition("src").localCheckpoint(eager=False)
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label")
    )
    for _ in range(iters):
        cnt = (
            e.join(
                labels.withColumnRenamed("node", "src").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    return labels


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Merge a day's NEW edges into a STORED (node, component)
    clustering — the incremental form of connected_components and the
    missing last step of the daily dedup pipeline: the stored-index
    probes emit the day's near-dup PAIRS in O(delta), and this folds
    them into yesterday's clusters without re-walking history's edges.

    Construction: each stored assignment becomes a STAR edge
    (node → component; the component id IS a member node — the
    min-label invariant — so stars preserve exactly the old graph's
    connectivity), unioned with the new edges, then the standard
    min-label propagation.  Correctness: CC(stars ∪ Δ) = CC(E ∪ Δ)
    because stars and E have identical transitive closure over the old
    nodes; min-label ids survive because a merged cluster's minimum is
    min(old component ids, new node ids) either way (oracle-proven by
    dedup_cc_incremental's hash against the one-shot recursive CTE).

    Cost: the propagated frame is |clustered nodes| + |Δ| rows — never
    the historical EDGE count (similarity graphs are edge-heavy), and
    stars have diameter ≤ 2, so rounds ≈ the diameter of the NEW
    linkage only.  Nodes appear in the output iff they touch an edge
    (old stars or Δ) — the same contract as connected_components.
    [extension].
    """
    star = labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("nbr"),
    )
    delta = new_edges.select(
        F.col(src).cast("long").alias("node"),
        F.col(dst).cast("long").alias("nbr"),
    )
    return connected_components(
        star.unionByName(delta), src="node", dst="nbr"
    )


def community_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Newman MODULARITY contributions of a community assignment over
    a SYMMETRIZED edge list — the quality metric that turns label
    propagation from "a labelling" into "a good labelling":

        Q = Σ_c [ in_c/M − (deg_c/M)² ]

    with M = |directed symmetric edges| (= 2m), in_c = directed
    intra-community edges, deg_c = Σ degrees of c's members — the
    standard undirected form e_c/m − (d_c/2m)² rewritten in the
    directed-symmetric quantities this suite's graphs carry.

    Returns one row per community: (community, n_members, intra_edges,
    degree_sum, q_contrib).  All counts are exact integers from two
    grouped aggregations (each endpoint labelled via one join against
    the node-sized label table); the two divisions and one multiply
    are single exactly-rounded IEEE ops, so q_contrib is bit-identical
    cross-engine after round(·, 6) — the suite's determinism contract.
    M arrives as a 1-row broadcast (the pagerank scalar pattern), no
    driver collect.  [extension].
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    lab = labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )
    m_tot = e.agg(F.count(F.lit(1)).cast("double").alias("m"))
    both = (
        e.join(
            lab.withColumnRenamed("node", "src").withColumnRenamed(
                "label", "l_src"
            ),
            "src",
        )
        .join(
            lab.withColumnRenamed("node", "dst").withColumnRenamed(
                "label", "l_dst"
            ),
            "dst",
        )
    )
    per_c = both.groupBy(F.col("l_src").alias("community")).agg(
        F.count(F.lit(1)).alias("degree_sum"),  # out-deg ≡ degree (symmetric)
        F.count(F.when(F.col("l_src") == F.col("l_dst"), 1)).alias(
            "intra_edges"
        ),
    )
    members = lab.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        per_c.join(members, "community")
        .crossJoin(F.broadcast(m_tot))
        .select(
            "community",
            "n_members",
            F.col("intra_edges").cast("long").alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round(
                F.col("intra_edges") / F.col("m")
                - (F.col("degree_sum") / F.col("m"))
                * (F.col("degree_sum") / F.col("m")),
                6,
            ).alias("q_contrib"),
        )
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    checkpoint_every: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """HITS (Kleinberg 1999) over a DIRECTED edge list (src, dst) →
    (hubs: (node, score), authorities: (node, score)), L1-normalized
    each half-step — the hub/authority complement to PageRank's single
    centrality: on a bipartite who-supplies-whom graph, hubs are the
    broadly-sourcing side and authorities the broadly-sourced side,
    and unlike PageRank the two sides are scored by MUTUAL
    reinforcement (a good hub points at good authorities and vice
    versa), not by random-walk mass.

    Determinism (the pagerank contract, `plans/analytics.py`):
    contributions are summed in DECIMAL(38,18) (order-free), each
    normalization is ONE correctly-rounded IEEE division by the
    decimal-exact L1 total cast to double, and no libm call appears —
    so an unrolled-CTE SQL oracle hash-matches bit-for-bit.

    Scale shape (the pagerank lineage discipline): edges are hash-
    partitioned by the join side of each half-step ONCE (two cached
    copies, src- and dst-partitioned) and lazily localCheckpoint-ed;
    every half-step is one shuffle_hash join of the node-sized score
    table against cached edge blocks (build side = scores) plus one
    grouped decimal sum; the L1 total is a 1-row broadcast.  Score
    tables are checkpointed every ``checkpoint_every`` rounds so long
    runs don't compound plan replay.
    """
    # Materialise the input edge list ONCE before deriving the two
    # layouts (r13): e_src and e_dst each lazily re-evaluated the
    # caller's upstream pipeline (a corpus-sized join + distinct in
    # hits_hubs_authorities) — checkpointing the shared parent makes
    # both repartitions read the same cached blocks, halving the
    # edge-build cost (the connected_components pre-symmetrise
    # precedent).
    base = edges.localCheckpoint(eager=False)
    e_src = base.repartition("src").localCheckpoint(eager=False)
    e_dst = base.repartition("dst").localCheckpoint(eager=False)
    hubs = (
        e_src.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(1.0).alias("score"))
    )

    def _half(
        scores: DataFrame, edge_cached: DataFrame, from_col: str, to_col: str
    ) -> DataFrame:
        raw = (
            edge_cached.join(
                scores.hint("shuffle_hash"),
                edge_cached[from_col] == scores.node,
            )
            .groupBy(F.col(to_col).alias("node"))
            .agg(F.sum(F.col("score").cast("decimal(38,18)")).alias("m"))
            # raw feeds BOTH the L1 total and the normalize select;
            # without a checkpoint the half-step's join+groupBy would
            # execute twice per round (measured 2× wall at sf0.1) —
            # the lazy checkpoint materialises it once on first use.
            .localCheckpoint(eager=False)
        )
        tot = raw.agg(F.sum("m").cast("double").alias("t"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "node",
            (F.col("m").cast("double") / F.col("t")).alias("score"),
        )

    auths = None
    for i in range(iters):
        auths = _half(hubs, e_src, "src", "dst")
        hubs = _half(auths, e_dst, "dst", "src")
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            hubs = hubs.localCheckpoint(eager=False)
            auths = auths.localCheckpoint(eager=False)
    return hubs, auths


# One-hop budgets for the UNMIXED fast attempt: the common dense-core
# SCC graph (trade/dedup shapes) colors forward in ~10 one-hop rounds
# and sweeps backward in ≤ 8, so the whole decomposition runs in
# original id space with zero relabeling overhead; graphs that exhaust
# either budget escalate to the mixed pointer-doubling rerun.
_SCC_ONEHOP_FW = 16
_SCC_ONEHOP_BW = 8
# Inner round at which the MIXED rerun's coloring escalates from cheap
# one-hop relaxation (2 shuffles/round) to pointer doubling (adds the
# color self-join + stats severing).
_SCC_JUMP_FROM = 4


class _EscalateToMixed(Exception):
    """Internal: the unmixed one-hop attempt exhausted a budget."""


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 12,
    max_inner: int = 60,
    stats: dict | None = None,
) -> DataFrame:
    """Strongly connected components of a DIRECTED edge list via the
    trim + forward-coloring + backward-sweep decomposition (Orzan's
    coloring algorithm; the distributed SCC used by FW-BW-Trim, Hong
    et al. 2013) — the directed completion of the graph suite: CC
    answers mutual reachability for UNDIRECTED graphs, SCC for
    directed ones (cycle detection, dependency condensation, link-farm
    collapse in web-graph curation).

    Returns (node, scc) where scc is the component's minimum node id —
    the CC determinism contract: engine- and partitioning-independent.

    TWO-SPEED DESIGN (r12 — the r11 verdict's regression fix): the
    decomposition first runs entirely in ORIGINAL id space with plain
    one-hop relaxation under per-phase budgets (_SCC_ONEHOP_FW forward
    rounds, _SCC_ONEHOP_BW backward BFS rounds).  Dense real-world SCC
    graphs converge well inside those budgets, and the fast attempt
    pays no relabeling, no idmap, no representative re-election
    (forward color = min reaching id IS the component's min original
    id), and no doubling machinery — measured, the r11
    always-mixed design taxed the common case ~25% PER PHASE at
    sf0.1 (identical row counts, bit-reversed 64-bit ids).  Only a
    graph that exhausts a budget — a deep/adversarial diameter —
    escalates: the whole decomposition reruns in BIT-REVERSED id
    space (_id_mix) with pointer doubling from round _SCC_JUMP_FROM,
    which pins the 512-cycle worst case at O(log n) rounds in either
    orientation.  The wasted fast attempt costs ≤ (budget) cheap
    rounds — noise against the deep graph's own runtime.

    Per outer round (either space):
    1. TRIM — nodes with no in-edge or no out-edge in the live
       subgraph are singleton SCCs; peel iteratively.
    2. COLOR — propagate color(v) = min id that reaches v along the
       edge direction to fixpoint (mixed rerun: with pointer doubling,
       color[v] <- color[color[v]], sound by transitivity);
       convergence detected by counting changed rows (overflow-free).
    3. BACKWARD — budgeted frontier BFS from the roots over the
       reversed intra-class edges (mixed rerun fallback: the same
       doubling min-reach coloring — rcolor(v) = c  <=>  v reaches
       node c  <=>  v in SCC(c)).
    4. Remove settled nodes; repeat on the remainder.

    Scale shape: one-shuffle-per-round discipline, src-partitioned
    edge blocks reused across rounds (the HITS idiom), settled pieces
    unioned lazily, LAZY checkpoints materialised by the loop-
    condition counts (r13 — one job per round where the r12 shape
    paid an eager-materialisation pass plus an isEmpty probe),
    stats severing on doubling rounds (_sever_stats — iterative
    self-joins compound Catalyst's sizeInBytes estimates
    multiplicatively).  ``max_outer`` exhaustion fails LOUDLY rather than
    returning a partial labelling.
    """
    try:
        return _scc_impl(
            edges, src, dst, max_outer, max_inner, stats, mixed=False
        )
    except _EscalateToMixed:
        if stats is not None:
            stats["escalated"] = True
            stats.pop("inner_rounds", None)
        return _scc_impl(
            edges, src, dst, max_outer, max_inner, stats, mixed=True
        )


def _scc_impl(
    edges: DataFrame,
    src: str,
    dst: str,
    max_outer: int,
    max_inner: int,
    stats: dict | None,
    mixed: bool,
) -> DataFrame:
    def _id_mix(c):
        """64-bit BIT REVERSAL: a bijection on ids built from
        overflow-free mask/shift ops (ANSI-safe).  Min-label pointer
        doubling is O(log d) only when label order is UNCORRELATED
        with edge direction — an anti-sorted giant cycle degrades it
        to one-hop-per-round (simulated: 512-cycle converges in 11
        rounds forward, 512 reversed).  Bit-reversing the ids
        scrambles any such ordering (consecutive ids become a van der
        Corput sequence; xorshift was tried and stays near-monotone
        on small ints — 417 rounds); simulated post-mix: 14/18/24
        rounds at n=128/512/4096, BOTH directions.  The output
        contract (scc = component's min ORIGINAL id) is restored by
        _finish below."""
        for m, sh in (
            (0x5555555555555555, 1),
            (0x3333333333333333, 2),
            (0x0F0F0F0F0F0F0F0F, 4),
            (0x00FF00FF00FF00FF, 8),
            (0x0000FFFF0000FFFF, 16),
            (0x00000000FFFFFFFF, 32),
        ):
            c = (
                F.shiftrightunsigned(c, sh).bitwiseAND(F.lit(m))
            ).bitwiseOR(F.shiftleft(c.bitwiseAND(F.lit(m)), sh))
        return c

    raw_nodes = (
        edges.select(F.col(src).cast("long").alias("orig"))
        .unionByName(edges.select(F.col(dst).cast("long").alias("orig")))
        .distinct()
    )
    if mixed:
        idmap = raw_nodes.select(
            "orig", _id_mix(F.col("orig")).alias("node")
        ).localCheckpoint(eager=False)
        # idmap already holds the distinct node set (mixing is a
        # bijection) — deriving alive from it skips a third
        # distinct-over-edges exchange.
        alive = idmap.select("node").localCheckpoint(eager=False)
        e_all = edges.select(
            _id_mix(F.col(src).cast("long")).alias("src"),
            _id_mix(F.col(dst).cast("long")).alias("dst"),
        ).distinct()
    else:
        alive = raw_nodes.select(
            F.col("orig").alias("node")
        ).localCheckpoint(eager=False)
        e_all = edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        ).distinct()

    def _finish(d: DataFrame) -> DataFrame:
        """Restore the min-ORIGINAL-id contract.  Unmixed: the forward
        color already IS the component's min original id (the root r =
        min id reaching r; every SCC(r) member reaches r, so r is the
        SCC minimum) — return as-is.  Mixed: map ids back through
        idmap and re-elect each component's representative with one
        window over one exchange (not groupBy + join back)."""
        if not mixed:
            return d
        dd = d.join(idmap, "node").select(
            F.col("orig").alias("o"), "scc"
        )
        w = Window.partitionBy("scc")
        return dd.select(
            F.col("o").alias("node"), F.min("o").over(w).alias("scc")
        )

    # src-partitioned once (the HITS edge-block idiom): every coloring
    # round's push join and the trim/ecc src joins reuse the layout
    # instead of re-exchanging the edge side per round.  Lazy: the
    # first trim probe materialises it (r13).
    e = e_all.repartition("src").localCheckpoint(eager=False)
    # Settled pieces accumulate as a LIST of frames (each lazy over
    # already-checkpointed parents) and union once at _finish — the
    # r11 code eager-checkpointed the running union per piece, one
    # driver job each for no reader in between.  The empty seed keeps
    # an edgeless input returning an empty (node, scc) result.
    done_parts: list[DataFrame] = [
        alive.where(F.lit(False)).select(
            "node", F.col("node").alias("scc")
        )
    ]

    def _add(part: DataFrame) -> None:
        done_parts.append(part)

    def _done() -> DataFrame:
        out = done_parts[0]
        for piece in done_parts[1:]:
            out = out.unionByName(piece)
        return out

    for _ in range(max_outer):
        # --- 1. trim singleton SCCs (missing in- or out-edge) ---
        while True:
            has_out = e.select(F.col("src").alias("node")).distinct()
            has_in = e.select(F.col("dst").alias("node")).distinct()
            # One action per trim round: the trivial-count probe
            # materialises the lazy keep checkpoint as a side effect
            # (r13 — was an eager keep pass + an isEmpty probe).
            keep = has_out.join(has_in, "node").localCheckpoint(
                eager=False
            )
            trivial = alive.join(keep, "node", "left_anti")
            if trivial.count() == 0:
                break
            _add(trivial.select("node", F.col("node").alias("scc")))
            alive = keep
            e = (
                e.join(alive.withColumnRenamed("node", "src"), "src")
                .join(alive.withColumnRenamed("node", "dst"), "dst")
                .select("src", "dst")
                .repartition("src")
                .localCheckpoint(eager=False)
            )
        if alive.isEmpty():
            return _finish(_done().select("node", "scc"))

        def _min_color(e_sd: DataFrame, nodes: DataFrame) -> DataFrame:
            """Min-label propagation to fixpoint along ``e_sd``
            (src→dst).  Unmixed attempt: plain one-hop relaxation
            under the _SCC_ONEHOP_FW budget — exhaustion raises
            _EscalateToMixed.  Mixed rerun: POINTER DOUBLING from
            round _SCC_JUMP_FROM (color[v] ← color[color[v]], sound
            because "reaches" is transitive), so rounds are O(log
            diameter) — the guard against the giant-single-SCC
            quadratic regime (a pure n-cycle converges in ~log2 n
            rounds, pytest-pinned).  Convergence is detected by
            counting rows whose color shrank (overflow-free, unlike
            comparing SUM(color) across rounds, which could silently
            wrap on huge id domains)."""
            colors = nodes.select(
                "node", F.col("node").alias("color")
            ).localCheckpoint(eager=False)
            # The guaranteed-convergence cap is |V|+2 relaxation
            # rounds (round k spreads the min to everything within k
            # hops; the longest shortest path is < |V|) — but pricing
            # it requires a count job, so it is only computed if the
            # doubling budget max_inner is actually exhausted.
            cap = _SCC_ONEHOP_FW if not mixed else max_inner
            # Mixed mode extends ONCE past max_inner to the |V|+2
            # guaranteed-convergence cap; the flag (not a counter
            # comparison) makes the extension reachable — the r11
            # version tested `rnd == max_inner` INSIDE a
            # `while rnd < cap` loop with cap == max_inner, so the
            # safety net was dead code (ADVICE r12: a graph needing
            # > max_inner doubling rounds raised RuntimeError).
            extended = not mixed
            rnd = 0
            while rnd < cap:
                pushed = (
                    e_sd.join(
                        colors.withColumnRenamed("node", "src").hint(
                            "shuffle_hash"
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.min("color").alias("inc"))
                )
                # Cost schedule: every round is one action (lazy
                # checkpoint materialised by the convergence
                # aggregate — the r10 discipline).  The jump
                # self-join and stats severing engage together from
                # round _SCC_JUMP_FROM, mixed rerun only — the
                # copied-stats digits triple per SELF-JOIN round, so
                # pure one-hop rounds don't compound them, but once
                # jumping starts severing every round keeps them at
                # the default forever.
                if mixed and rnd >= _SCC_JUMP_FROM:
                    jump = colors.select(
                        "node", F.col("color").alias("c1")
                    ).join(
                        colors.select(
                            F.col("node").alias("c1"),
                            F.col("color").alias("jmp"),
                        ),
                        "c1",
                    ).select("node", "jmp")
                    stepped = (
                        colors.join(pushed, "node", "left")
                        .join(jump, "node")
                        .select(
                            "node",
                            F.least(
                                "color",
                                F.coalesce("inc", F.col("color")),
                                "jmp",
                            ).alias("color"),
                            (
                                (F.col("inc") < F.col("color"))
                                | (F.col("jmp") < F.col("color"))
                            )
                            .cast("long")
                            .alias("chg"),
                        )
                        .localCheckpoint(eager=False)
                    )
                    stepped = _sever_stats(stepped)
                else:
                    stepped = (
                        colors.join(pushed, "node", "left")
                        .select(
                            "node",
                            F.least(
                                "color", F.coalesce("inc", F.col("color"))
                            ).alias("color"),
                            (F.col("inc") < F.col("color"))
                            .cast("long")
                            .alias("chg"),
                        )
                        .localCheckpoint(eager=False)
                    )
                changed = stepped.agg(F.sum("chg")).collect()[0][0] or 0
                colors = stepped.drop("chg")
                if changed == 0:
                    if stats is not None:
                        stats.setdefault("inner_rounds", []).append(
                            rnd + 1
                        )
                    return colors
                rnd += 1
                if rnd >= cap and not extended:
                    # Doubling is expected-O(log d); past the budget
                    # we are in the degraded guaranteed-convergence
                    # regime: extend to the |V|+2 cap (round k spreads
                    # the min to everything within k hops; the longest
                    # shortest path is < |V|, so |V|+2 one-hop rounds
                    # always fix — only now worth the count action), and
                    # be LOUD about it (ADVICE r11/r12).
                    import warnings

                    extended = True
                    cap = max(cap, nodes.count() + 2)
                    warnings.warn(
                        f"SCC coloring exceeded max_inner={max_inner} "
                        f"rounds; continuing up to the |V|+2 "
                        f"convergence cap ({cap}) — expect one driver "
                        "round per remaining hop",
                        RuntimeWarning,
                        stacklevel=2,
                    )
            if not mixed:
                raise _EscalateToMixed()
            raise RuntimeError(
                f"SCC coloring did not converge in {cap} rounds "
                "(invariant violation: min-relaxation must fix within "
                "|V| rounds)"
            )

        # --- 2. forward min-color propagation to fixpoint ---
        colors = _min_color(e, alive)
        # --- 3. backward pass over intra-class edges ---
        csrc = colors.select(
            F.col("node").alias("src"), F.col("color").alias("c_src")
        )
        cdst = colors.select(
            F.col("node").alias("dst"), F.col("color").alias("c_dst")
        )
        ecc = (
            e.join(csrc.hint("shuffle_hash"), "src")
            .join(cdst.hint("shuffle_hash"), "dst")
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .repartition("dst")
            .localCheckpoint(eager=False)
        )
        # FAST PATH: the r10 frontier BFS from the roots, budgeted —
        # dense dedup/trade SCCs have diameter ≤ a few, so the sweep
        # usually empties in 2-4 cheap rounds (two actions each, no jump
        # joins, no severing).  Only if the frontier survives the
        # budget (a deep SCC) do we pay for the doubling coloring
        # (unmixed attempt: escalate instead).
        sweep_nodes = (
            colors.where(F.col("node") == F.col("color"))
            .select("node")
            .localCheckpoint(eager=False)
        )
        # The initial frontier (the roots) is non-empty whenever alive
        # is, so the emptiness probe sits on nxt at the BOTTOM of each
        # round — one driver probe per round, not two, and the final
        # no-op union is skipped.
        frontier = sweep_nodes
        sweep_parts = [sweep_nodes]
        swept = False
        for _ in range(_SCC_ONEHOP_BW):
            # One RDD action per sweep round: the probe materialises
            # the lazy checkpoint (r13 — was eager + isEmpty; r14 —
            # _probe_count, no per-round count plan).
            nxt = (
                ecc.join(frontier.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"))
                .distinct()
                .join(sweep_nodes, "node", "left_anti")
                .localCheckpoint(eager=False)
            )
            if _probe_count(nxt) == 0:
                swept = True
                break
            sweep_parts.append(nxt)
            sweep_nodes = sweep_parts[0]
            for piece in sweep_parts[1:]:
                sweep_nodes = sweep_nodes.unionByName(piece)
            frontier = nxt
        if swept:
            settled = (
                sweep_nodes.join(colors, "node")
                .select("node", F.col("color").alias("scc"))
                .localCheckpoint(eager=False)
            )
            if stats is not None:
                stats.setdefault("inner_rounds", []).append(0)
        elif not mixed:
            raise _EscalateToMixed()
        else:
            # Backward doubling-coloring over the REVERSED intra-class
            # edges: rcolor(v) = min class-member id v reaches; class
            # ids are ≥ the class color c, so rcolor(v) == c  ⇔  v
            # reaches node c  ⇔  v ∈ SCC(c) — replacing the
            # one-edge-per-round backward BFS (O(SCC diameter) driver
            # rounds, the other half of the giant-cycle quadratic
            # regime) with the same O(log d) pass.
            rcolors = _min_color(
                ecc.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
                alive,
            )
            settled = (
                colors.join(
                    rcolors.withColumnRenamed("color", "rcolor"), "node"
                )
                .where(F.col("color") == F.col("rcolor"))
                .select("node", F.col("color").alias("scc"))
                .localCheckpoint(eager=False)
            )
        _add(settled)
        # --- 4. shrink the live graph and go again ---
        # One RDD action: the emptiness probe materialises settled +
        # alive (r14: _probe_count).
        alive = alive.join(settled, "node", "left_anti").localCheckpoint(
            eager=False
        )
        if _probe_count(alive) == 0:
            return _finish(_done().select("node", "scc"))
        e = (
            e.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .repartition("src")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(f"SCC did not decompose in {max_outer} outer rounds")



def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Deterministic random walks (DeepWalk/node2vec sampling,
    Perozzi et al. 2014): from every start node, walk ``steps`` hops,
    at each hop moving to the out-neighbour that minimises
    md5("{walk}:{step}:{neighbour}") — a seeded-uniform pick over the
    neighbourhood (the split_assign/md5 convention), so the walk
    corpus is a pure function of (graph, starts, steps): rerun-,
    partitioning- and engine-independent, replayable by an unrolled
    SQL oracle.  Walk corpora are the input of graph-embedding
    training (the skip-gram pairs come from these traces) and of
    neighbourhood-sampling evaluation.

    Returns (walk, step, node): step 0 is the start node; a walk ends
    early if its current node has no out-edge.

    Scale shape: per hop, ONE shuffle_hash join of the walk frontier
    (one row per live walk) against the src-partitioned cached edge
    blocks, then a min_by aggregate per walk — candidate volume is the
    frontier's total out-degree.  At web scale the same pick is served
    from a stored adjacency-list table (neighbours pre-grouped per
    node, the inverted-postings layout): the join returns ONE row per
    walk and the pick indexes the array by hash-mod-degree — swap-in
    documented here, argmin kept because it is exactly replayable
    cross-engine.  Lazy checkpoints per hop keep lineage O(1) without
    a per-hop materialisation action (r13); each hop's blocks are cached
    on first compute, so the two readers (next hop + trace union)
    share one evaluation.  [extension] — the reference has no graph
    surface.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    cur = (
        starts.select(
            F.col(node).cast("long").alias("walk"),
            F.col(node).cast("long").alias("node"),
        )
        # one walk per distinct start: duplicate start rows would
        # duplicate every step-0 trace row (later steps dedup through
        # the per-walk aggregate, making the output inconsistent)
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = cur.withColumn("step", F.lit(0).cast("long"))
    for t in range(1, steps + 1):
        h = F.md5(
            F.concat_ws(
                ":",
                F.col("walk").cast("string"),
                F.lit(str(t)),
                F.col("dst").cast("string"),
            )
        )
        cur = (
            e.join(
                cur.select(
                    "walk", F.col("node").alias("src")
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy("walk")
            .agg(
                F.min_by(
                    F.col("dst"), F.struct(h.alias("h"), F.col("dst"))
                ).alias("node")
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            cur.withColumn("step", F.lit(t).cast("long"))
        )
    return out.select("walk", "step", "node")


def stress_centrality_sampled(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 6,
) -> DataFrame:
    """Sampled-source BETWEENNESS-family centrality (Brandes's
    dependency accumulation, Brandes 2001; source sampling per
    Brandes–Pich 2007) in its INTEGER dependency-counting form —
    STRESS centrality (Shimbel 1953): stress(v) = number of shortest-
    path instances with v as an interior node, summed over the
    sampled roots, restricted to paths of at most ``max_depth`` edges
    (the bounded-distance "k-betweenness" variant, also Brandes–Pich).
    Integer counts make the result hash-exact cross-engine — the
    fractional σ_sv/σ_st of classic betweenness has no terminating
    decimal form, so an oracle could only approximate it; stress
    preserves the ranking signal centrality users act on while
    keeping the oracle-replay discipline intact.

    Phase 1 (forward, Brandes's BFS): multi-source level-synchronous
    path counting — σ(root, v) = number of shortest root→v paths,
    computed level by level: σ of a new frontier node is the SUM of σ
    over its shortest-path-DAG predecessors (one shuffle_hash join of
    the frontier against the src-partitioned cached edge blocks +
    one groupBy per level — the bfs_hops discipline, all K roots
    batched through the same rounds keyed (root, node)).

    Phase 2 (reverse, the integer accumulation): walking levels
    deepest-first, g(v) = Σ_{DAG edges v→w} (1 + g(w)) counts the
    DAG continuations of length ≥ 1 from v; then σ(v)·g(v) = number
    of (shortest root→v path, continuation) pairs = shortest-path
    instances through interior v.  One join per level against the
    settled lower level — O(diameter) rounds total, every level
    lazily checkpointed (O(1) lineage; r13 — the forward probe count
    materialises its level in the SAME job, and the reverse levels
    are cached on first compute by the final action, so the loop
    pays one driver action per forward level and zero per reverse
    level), empty-frontier short-circuit, no driver-side state
    beyond the bounded level list.

    Returns (node, stress) for nodes with stress > 0.  [extension] —
    the reference has no graph surface.
    """
    e = edges.repartition("src").localCheckpoint(eager=False)
    lvl0 = (
        sources.select("node")
        .distinct()
        .select(
            F.col("node").alias("root"),
            "node",
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint(eager=False)
    )
    levels = [lvl0]
    visited = lvl0.select("root", "node").localCheckpoint(eager=False)
    cur = lvl0
    for _d in range(1, max_depth + 1):
        nxt = (
            e.join(
                cur.withColumnRenamed("node", "src").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["root", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        # One RDD action per level: the probe materialises the lazy
        # checkpoint (r13 — was eager + isEmpty, two actions; r14 —
        # _probe_count, no per-level count plan).
        if _probe_count(nxt) == 0:
            break
        levels.append(nxt)
        visited = visited.unionByName(
            nxt.select("root", "node")
        ).localCheckpoint(eager=False)
        cur = nxt
    contribs = []
    g_lower = levels[-1].select(
        "root", "node", F.lit(0).cast("long").alias("g")
    )
    for d in range(len(levels) - 2, -1, -1):
        upper = levels[d]
        gd = (
            e.join(
                upper.select(
                    "root", F.col("node").alias("src")
                ).hint("shuffle_hash"),
                "src",
            )
            .join(
                g_lower.select(
                    "root", F.col("node").alias("dst"), "g"
                ).hint("shuffle_hash"),
                ["root", "dst"],
            )
            .groupBy("root", F.col("src").alias("node"))
            .agg(F.sum(F.col("g") + 1).alias("g"))
        )
        gd = (
            upper.join(gd, ["root", "node"], "left")
            .select(
                "root",
                "node",
                "sigma",
                F.coalesce("g", F.lit(0)).cast("long").alias("g"),
            )
            .localCheckpoint(eager=False)
        )
        if d >= 1:
            contribs.append(
                gd.select(
                    "node", (F.col("sigma") * F.col("g")).alias("c")
                )
            )
        g_lower = gd.select("root", "node", "g")
    if not contribs:
        schema_src = sources.sparkSession
        return schema_src.createDataFrame([], "node long, stress long")
    allc = contribs[0]
    for piece in contribs[1:]:
        allc = allc.unionByName(piece)
    return (
        allc.groupBy("node")
        .agg(F.sum("c").cast("long").alias("stress"))
        .where(F.col("stress") > 0)
    )
