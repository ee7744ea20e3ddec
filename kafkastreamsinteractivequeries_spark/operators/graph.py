"""Link-graph operators: degrees and fixed-point PageRank.

Web-corpus curation pipelines rank hosts/pages by link centrality
before text-level filtering (Common Crawl publishes harmonic/PageRank
centrality per host; quality-filter stacks use it as a prior).  The
reference app has no graph surface, so this module is part of the
LLM-data-pipeline extension suite.

Design for 100 TB:

- **Edges never change across iterations** — each power-iteration step
  is one join of the (skinny) rank table against the edge list on
  ``src`` plus one aggregation shuffle on ``dst``.  On a real cluster
  the edge list is pre-partitioned (bucketed) by ``src`` ONCE and every
  iteration's join co-locates against it; the rank table is two longs
  per node, orders of magnitude smaller than the edges.
- **Fixed-point integer arithmetic** end-to-end (rank mass in
  ``scale`` micro-units, shares via integer ``div``): bit-identical
  across engines and partitionings — the repo-wide rule that
  hash-verified values never pass through floating point.  Mass is not
  exactly conserved (each div floors), which is fine: PageRank is used
  as an ORDERING, and determinism is worth more than the last
  micro-unit.
- **Dangling mass is redistributed uniformly** (the standard fix):
  nodes with no out-edges contribute ``rank div n_nodes`` to everyone,
  computed as a 1-row aggregate and broadcast via crossJoin — the
  repo's scalar-broadcast pattern, never a driver collect.
- **Iterations are bounded and explicit** (default 3): each step ends
  in a ``localCheckpoint`` barrier so lineage stays flat — the same
  materialization-barrier pattern the BPE trajectory and Lloyd
  training use.

No counterpart in the reference (closest surface: none —
``/root/reference/src/main/java`` has no graph operators); public
algorithm per Page et al. 1999 / the Pregel formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGERANK_SCALE = 10**12


def normalize_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Dedup the edge list and drop self-loops: PageRank over a simple
    directed graph.  One distinct shuffle; at scale this is the one-off
    normalization you run before landing the bucketed edge table."""
    return (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_deg) over a normalized edge list."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    """(id, in_deg) over a normalized edge list."""
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    weight_col: str | None = None,
    edges_pinned: bool = False,
    nodes_df: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration power-iteration PageRank in integer micro-units.

    Checkpoints here are EAGER: every iteration broadcasts 1-row
    scalars derived from the checkpointed rank table, and a broadcast-
    exchange thread materializing a LAZY checkpoint can deadlock with
    the DAG scheduler (Java-level RDDCheckpointData-vs-RDD lock cycle,
    observed in the r10 suite) — eager materialization happens on the
    calling thread before any broadcast exists.

    ``edges`` must be normalized (see :func:`normalize_edges`).  Nodes
    are the union of both endpoints.  Per iteration, with integer
    division throughout::

        share(u→v) = rank(u) div out_deg(u)
        dangling   = Σ rank(u) over u with no out-edges
        rank'(v)   = ((100-damping_pct) * base) div 100
                   + (damping_pct * (inflow(v) + dangling div n)) div 100

    where ``base = scale div n`` is the uniform initial rank.  Returns
    one row per node: ``id, out_deg, in_deg, rank, rank_prev`` (the
    last two iterations — a cheap convergence signal).  All longs.

    ``weight_col`` names an integer edge-weight column for WEIGHTED
    PageRank (a host linking another host twenty times endorses it
    more than once — link COUNTS are the natural weights of a
    host-level graph): the share becomes
    ``(rank(u) * w(u→v)) div Σw(u→·)`` — same integer determinism,
    same join/agg shape, out_deg reported as the weight SUM.  Weights
    must be positive; keep Σw per node ≪ 2^63/scale (the int64
    product envelope, same class as the PCA scaling notes).

    ``edges_pinned=True``: the caller guarantees ``edges`` is ALREADY a
    materialized checkpoint of exactly the projected shape, so the
    internal eager pin (one blocking job) is skipped.  ``nodes_df``: a
    pre-pinned union-distinct endpoint table (skips another blocking
    job).  The shared-pin contract for callers running several graph
    algorithms over ONE edge list (the e1 driver key): without it each
    algorithm re-materializes identical edge/node tables serially in
    its own build chain."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if weight_col is None:
        e = edges.select("src", "dst", F.lit(1).cast("long").alias("w"))
    else:
        e = edges.select("src", "dst", F.col(weight_col).cast("long").alias("w"))
    edges = e if edges_pinned else e.localCheckpoint(eager=True)
    nodes = (
        nodes_df
        if nodes_df is not None
        else edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # out_deg is the WEIGHT SUM (== edge count when unweighted)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").cast("long").alias("out_deg")
    )
    indeg = in_degrees(edges)
    # 1-row scalar (n, base) broadcast to every node via crossJoin —
    # never a driver-side collect.
    n_row = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST({scale} AS BIGINT) div count(1)").alias("base"),
    ).localCheckpoint(eager=True)

    ranks = (
        nodes.join(deg, "id", "left")
        .crossJoin(F.broadcast(n_row))
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            "n",
            "base",
            F.col("base").cast("long").alias("rank"),
            F.col("base").cast("long").alias("rank_prev"),
        )
        .localCheckpoint(eager=True)
    )

    teleport = F.expr(f"(CAST({100 - damping_pct} AS BIGINT) * base) div 100")
    for _ in range(iterations):
        # Dangling mass: one scalar aggregate over the skinny rank table.
        dangling = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dangling")
        )
        inflow = (
            edges.join(
                ranks.filter(F.col("out_deg") > 0).select(
                    F.col("id").alias("src"),
                    "rank",
                    F.col("out_deg").alias("_ow"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(F.expr("(rank * w) div _ow"))
                .cast("long")
                .alias("inflow")
            )
        )
        ranks = (
            ranks.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "out_deg",
                "n",
                "base",
                (
                    teleport
                    + F.expr(
                        f"(CAST({damping_pct} AS BIGINT)"
                        " * (coalesce(inflow, CAST(0 AS BIGINT))"
                        " + (dangling div n))) div 100"
                    )
                ).cast("long").alias("rank"),
                F.col("rank").alias("rank_prev"),
            )
            .localCheckpoint(eager=True)
        )

    return (
        ranks.join(indeg, "id", "left")
        .select(
            "id",
            "out_deg",
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            "rank",
            "rank_prev",
        )
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    weight_col: str | None = None,
    edges_pinned: bool = False,
    nodes_df: DataFrame | None = None,
) -> DataFrame:
    """Seeded (personalized) PageRank — TrustRank (Gyöngyi et al.,
    VLDB 2004): the teleport mass lands ONLY on a trusted seed set
    instead of uniformly, so reputation flows outward from known-good
    hosts and link farms that no trusted host reaches score ~zero.
    The corpus-quality prior web pipelines seed from curated domain
    lists.

    ``seeds``: (id) — each seed gets an equal share of the teleport
    mass (``(100-damping_pct)·scale div 100 div n_seeds`` micro-units;
    rank starts as that same distribution).  Same integer arithmetic,
    join/agg shape, dangling redistribution (dangling mass returns to
    the SEEDS, per the personalized formulation), and
    ``localCheckpoint`` barriers as :func:`pagerank`.

    Output: ``id, out_deg, in_deg, rank, rank_prev, is_seed``.

    ``edges_pinned`` / ``nodes_df``: the shared-pin contract — see
    :func:`pagerank`."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    e = edges.select("src", "dst", w.alias("w"))
    edges = e if edges_pinned else e.localCheckpoint(eager=False)
    nodes = (
        nodes_df
        if nodes_df is not None
        else edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").cast("long").alias("out_deg")
    )
    indeg = in_degrees(edges)
    seed_ids = seeds.select(F.col("id").cast("long").alias("id")).distinct()
    # only seeds that exist in the graph receive mass
    seed_ids = seed_ids.join(nodes, "id", "left_semi").localCheckpoint(
        eager=False
    )
    n_seed_row = seed_ids.agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    ).localCheckpoint(eager=True)
    teleport_total = (100 - damping_pct) * scale // 100
    ranks = (
        nodes.join(deg, "id", "left")
        .join(seed_ids.select("id", F.lit(1).alias("is_seed")), "id", "left")
        .crossJoin(F.broadcast(n_seed_row))
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("is_seed", F.lit(0)).cast("int").alias("is_seed"),
            "ns",
            F.when(
                F.col("is_seed") == 1,
                F.expr(f"CAST({scale} AS BIGINT) div ns"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank"),
        )
        .withColumn("rank_prev", F.col("rank"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        dangling = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dangling")
        )
        inflow = (
            edges.join(
                ranks.filter(F.col("out_deg") > 0).select(
                    F.col("id").alias("src"),
                    "rank",
                    F.col("out_deg").alias("_ow"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(F.expr("(rank * w) div _ow"))
                .cast("long")
                .alias("inflow")
            )
        )
        ranks = (
            ranks.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "out_deg",
                "is_seed",
                "ns",
                (
                    F.when(
                        F.col("is_seed") == 1,
                        F.expr(
                            f"CAST({teleport_total} AS BIGINT) div ns"
                            f" + (CAST({damping_pct} AS BIGINT)"
                            " * (dangling div ns)) div 100"
                        ),
                    ).otherwise(F.lit(0).cast("bigint"))
                    + F.expr(
                        f"(CAST({damping_pct} AS BIGINT)"
                        " * coalesce(inflow, CAST(0 AS BIGINT))) div 100"
                    )
                ).cast("long").alias("rank"),
                F.col("rank").alias("rank_prev"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.join(indeg, "id", "left").select(
        "id",
        "out_deg",
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        "rank",
        "rank_prev",
        "is_seed",
    )


def hyperball_harmonic(
    edges: DataFrame,
    radius: int = 3,
    p: int = 6,
    edges_pinned: bool = False,
    nodes_df: DataFrame | None = None,
) -> DataFrame:
    """Approximate HARMONIC CENTRALITY by HyperBall (Boldi & Vigna,
    arXiv:1308.2144) — the algorithm behind Common Crawl's published
    host rankings.  Exact harmonic centrality
    ``H(v) = Σ_u 1/d(u,v)`` needs all-pairs shortest paths; HyperBall
    replaces each node's reach-ball with a MERGEABLE HLL sketch:

        B_r(v) = B_{r-1}(v) ∪ ⋃_{u→v} B_{r-1}(u)

    which in register form is one edge⋈registers join + a
    (node, bucket) max-merge per radius — exactly the
    ``sketches.hll_registers`` machinery, reused verbatim, so state is
    O(m=2^p) skinny rows per node and every step is a
    partial-aggregating shuffle.  Centrality accumulates
    ``Σ_r (|B_r| − |B_{r-1}|) / r`` for r ≤ ``radius`` (a truncated
    harmonic sum — distances beyond the radius contribute 0, the
    standard HyperBall cut-off).  Balls grow along REVERSED edges:
    H(v) counts the nodes that can REACH v, the in-link notion host
    ranking wants.

    Deterministic: the ring hash, registers, and estimator are the
    engine-portable sketch primitives, so results are partitioning-
    invariant (approximation error is the HLL ±1.04/√m, not
    run-to-run noise).  Output: (id, reach_est, harmonic)."""
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    if radius < 1:
        raise ValueError("radius must be >= 1")
    # edges_pinned / nodes_df: the shared-pin contract — see pagerank.
    e = edges.select("src", "dst")
    edges = e if edges_pinned else e.localCheckpoint(eager=True)
    nodes = (
        nodes_df
        if nodes_df is not None
        else edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    regs = hll_registers(
        nodes.select(F.col("id").alias("node"), F.col("id").alias("key")),
        "key",
        ["node"],
        p,
    ).localCheckpoint(eager=True)

    def est(r: DataFrame) -> DataFrame:
        return hll_estimate(r, ["node"], p).select(
            "node", F.col("distinct_estimate").alias("b")
        )

    prev = est(regs)
    acc = prev.select(
        "node", F.lit(0.0).alias("harmonic"), F.col("b").alias("_prev")
    )
    for r in range(1, radius + 1):
        moved = (
            edges.join(regs.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "bucket", "reg")
        )
        regs = (
            regs.unionByName(moved)
            .groupBy("node", "bucket")
            .agg(F.max("reg").alias("reg"))
            .localCheckpoint(eager=True)
        )
        cur = est(regs)
        acc = (
            acc.join(cur, "node")
            .select(
                "node",
                (
                    F.col("harmonic")
                    + F.greatest(F.col("b") - F.col("_prev"), F.lit(0.0))
                    / F.lit(float(r))
                ).alias("harmonic"),
                F.col("b").alias("_prev"),
            )
            .localCheckpoint(eager=True)
        )
    return acc.select(
        F.col("node").alias("id"),
        F.round(F.col("_prev"), 6).alias("reach_est"),
        F.round("harmonic", 6).alias("harmonic"),
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    norm_target: int = 1 << 20,
    edges_pinned: bool = False,
    nodes_df: DataFrame | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) in fixed-point
    integers — the complement to PageRank for query-dependent link
    analysis: a good AUTHORITY is pointed to by good hubs
    (``a = Eᵀh``), a good HUB points to good authorities (``h = Ea``).
    Per iteration each vector is rescaled to max-norm ``norm_target``
    by integer floor division (the PCA/power-iteration pattern — L2
    would need a sqrt; the RANKING is the result), so the trajectory
    is bit-deterministic across engines and partitionings.

    Shape: two edge⋈vector equi-joins + two aggregations per
    iteration over skinny (id, score) tables, ``localCheckpoint``
    barriers throughout — the pagerank cost model.  Output:
    (id, hub, authority) longs.

    int64 envelope (the pagerank weight-note discipline): post-rescale
    scores are ≤ norm_target = 2^20, so a summed score is
    ≤ 2^20·max_in_degree and the rescale product score·norm_target is
    ≤ 2^40·max_in_degree — EXACT integer arithmetic up to
    max in-degree < 2^23 (~8M in-edges on one node), past which the
    bigint product wraps.  The rescale is a pure-integer ``div`` (no
    double division), so there is no 2^53 precision cliff below that
    wrap point."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # edges_pinned / nodes_df: the shared-pin contract — see pagerank.
    e = edges.select("src", "dst")
    edges = e if edges_pinned else e.localCheckpoint(eager=True)
    nodes = (
        nodes_df
        if nodes_df is not None
        else edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hv = nodes.select("id", F.lit(norm_target).cast("long").alias("h"))
    av = nodes.select("id", F.lit(norm_target).cast("long").alias("a"))

    def rescale(df: DataFrame, col: str) -> DataFrame:
        # Pure-integer rescale: scores are non-negative sums, so
        # truncating `div` IS floor division; the double-division form
        # (score * NT / m) would lose exactness past 2^53 (see the
        # envelope note above).
        m = df.agg(F.max(F.abs(col)).alias("m"))
        return (
            df.crossJoin(F.broadcast(m))
            .select(
                "id",
                F.when(F.col("m") == 0, F.col(col))
                .otherwise(
                    F.expr(f"(cast({col} as bigint) * {norm_target}L) div m")
                )
                .cast("long")
                .alias(col),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(iterations):
        a_new = (
            edges.join(hv.select(F.col("id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("a"))
        )
        av = rescale(
            nodes.join(a_new, "id", "left").select(
                "id", F.coalesce("a", F.lit(0)).cast("long").alias("a")
            ),
            "a",
        )
        h_new = (
            edges.join(av.select(F.col("id").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h"))
        )
        hv = rescale(
            nodes.join(h_new, "id", "left").select(
                "id", F.coalesce("h", F.lit(0)).cast("long").alias("h")
            ),
            "h",
        )
    return hv.join(av, "id").select(
        "id", F.col("h").alias("hub"), F.col("a").alias("authority")
    )


def graph_summary(edges: DataFrame, edges_pinned: bool = False) -> DataFrame:
    """One-row graph datasheet over a normalized edge list: node/edge
    counts, degree extremes, dangling share, and RECIPROCITY (the
    fraction of edges whose reverse also exists — web graphs sit near
    0.2-0.3; a near-1.0 host graph suggests link rings).  Reciprocity
    is one self-join on the reversed key; everything else folds into
    single-row aggregates cross-joined into ONE plan — zero driver
    actions (the caller's collect is the only action), so the pattern
    is safe to copy into hotter code.

    ``edges_pinned``: the shared-pin contract — see :func:`pagerank`."""
    e = edges.select("src", "dst")
    edges = e if edges_pinned else e.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    node_agg = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    edge_agg = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    deg_agg = out_degrees(edges).agg(
        F.coalesce(F.max("out_deg"), F.lit(0)).alias("max_out_degree"),
        F.count(F.lit(1)).alias("_n_with_out"),
    )
    recip_agg = edges.join(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ),
        ["src", "dst"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("_recip"))
    # 1-row combining joins on a DATA-DERIVED zero key (col pmod 1):
    # plans as BroadcastHashJoin instead of the
    # BroadcastNestedLoopJoin a bare crossJoin produces —
    # value-identical, but keeps consumers' no-nested-loop plan
    # contracts meaningful (an accidental cartesian would still trip
    # them).  Neither lit(1) nor col*0 works: Catalyst folds both
    # (constant equality; multiply-by-zero on a non-nullable column)
    # and reverts to the nested loop — pmod(col, 1) has no fold rule.
    def _k(df: DataFrame, col: str) -> DataFrame:
        return df.select(
            "*", F.pmod(F.col(col), F.lit(1)).cast("int").alias("_k")
        )

    return (
        _k(node_agg, "n_nodes")
        .join(F.broadcast(_k(edge_agg, "n_edges")), "_k")
        .join(F.broadcast(_k(deg_agg, "max_out_degree")), "_k")
        .join(F.broadcast(_k(recip_agg, "_recip")), "_k")
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("max_out_degree").cast("long").alias("max_out_degree"),
            (F.col("n_nodes") - F.col("_n_with_out"))
            .cast("long")
            .alias("n_dangling"),
            F.when(F.col("n_edges") == 0, F.lit(0))
            .otherwise(F.expr("(1000 * _recip) div n_edges"))
            .cast("long")
            .alias("reciprocity_permille"),
        )
    )
