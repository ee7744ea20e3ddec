"""PageRank / degree operators (operators/graph.py).

The fixed-point semantics are pinned against an independent pure-Python
reference that replays the identical integer arithmetic, and the result
is shown partitioning-invariant (the determinism contract every
hash-verified operator carries).
"""

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators import graph as G


def _py_pagerank(edge_list, iterations=3, damping_pct=85, scale=10**12):
    """Independent reference: same integer fixed-point semantics."""
    edges = sorted({(s, d) for s, d in edge_list if s != d})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outd = {v: 0 for v in nodes}
    for s, _ in edges:
        outd[s] += 1
    n = len(nodes)
    base = scale // n
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        dangling = sum(rank[v] for v in nodes if outd[v] == 0)
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // outd[s]
        rank = {
            v: ((100 - damping_pct) * base) // 100
            + (damping_pct * (inflow[v] + dangling // n)) // 100
            for v in nodes
        }
    return rank, outd


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4),
    (1, 2),          # duplicate: must collapse
    (2, 2),          # self-loop: must drop
    (6, 3),          # 6 has out-edges but no in-edges
    (3, 7),          # 7 is dangling (no out-edges)
]


def _spark_ranks(spark, iterations=3, num_partitions=None):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    if num_partitions:
        df = df.repartition(num_partitions)
    edges = G.normalize_edges(df)
    out = G.pagerank(edges, iterations=iterations)
    return {r["id"]: r for r in out.collect()}


def test_pagerank_matches_python_reference(spark):
    ref, outd = _py_pagerank(EDGES)
    got = _spark_ranks(spark)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v]["rank"] == ref[v], f"node {v}"
        assert got[v]["out_deg"] == outd[v]
    # rank_prev is the (iterations-1) trajectory point
    ref_prev, _ = _py_pagerank(EDGES, iterations=2)
    for v in ref_prev:
        assert got[v]["rank_prev"] == ref_prev[v]


def test_pagerank_partitioning_invariant(spark):
    a = _spark_ranks(spark, num_partitions=1)
    b = _spark_ranks(spark, num_partitions=7)
    assert {v: r["rank"] for v, r in a.items()} == {
        v: r["rank"] for v, r in b.items()
    }


def test_pagerank_structural_properties(spark):
    got = _spark_ranks(spark)
    # node 3 has the most in-links — it must outrank the unlinked node 6
    assert got[3]["rank"] > got[6]["rank"]
    # a node nothing links to gets exactly teleport + dangling share
    ref, _ = _py_pagerank(EDGES)
    assert got[6]["rank"] == ref[6]
    assert got[6]["in_deg"] == 0
    # dangling node exists and carries rank mass forward
    assert got[7]["out_deg"] == 0 and got[7]["rank"] > 0


def test_degrees(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    edges = G.normalize_edges(df)
    outd = {r["id"]: r["out_deg"] for r in G.out_degrees(edges).collect()}
    ind = {r["id"]: r["in_deg"] for r in G.in_degrees(edges).collect()}
    assert outd[1] == 2  # duplicate (1,2) collapsed
    assert 2 not in {s for s, d in EDGES if s == d} or outd.get(2) == 1
    assert ind[3] == 4


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    edges = G.normalize_edges(df)
    try:
        G.pagerank(edges, iterations=0)
    except ValueError:
        return
    raise AssertionError("expected ValueError")


def test_weighted_pagerank(spark):
    """weight_col: shares split by weight ((rank*w) div sum_w); with
    all-1 weights the result is bit-identical to the unweighted path
    (the driver-verified semantics), and a heavier edge pulls more
    rank to its target."""
    from pyspark.sql import functions as F

    wdf = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 9), (2, 1, 1), (3, 1, 1)],
        "src long, dst long, w long",
    )
    edges = wdf.select("src", "dst")
    plain = {r["id"]: r["rank"] for r in G.pagerank(edges).collect()}
    ones = {
        r["id"]: r["rank"]
        for r in G.pagerank(
            wdf.withColumn("w", F.lit(1)), weight_col="w"
        ).collect()
    }
    assert plain == ones  # all-1 weights == unweighted, bit-for-bit

    weighted = {r["id"]: r for r in G.pagerank(wdf, weight_col="w").collect()}
    assert weighted[3]["rank"] > weighted[2]["rank"]  # the 9x edge wins
    assert weighted[1]["out_deg"] == 10  # weight SUM reported


def test_trustrank_flows_from_seeds(spark):
    """TrustRank: teleport lands only on seeds, reputation decays with
    link distance from them, and a disconnected farm that no trusted
    host reaches scores zero; Python integer replay pins the exact
    trajectory."""
    # seed 1 -> 2 -> 3; farm 10 <-> 11 disconnected from the seed
    edges_rows = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)]
    edges = G.normalize_edges(
        spark.createDataFrame(edges_rows, "src long, dst long")
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r for r in G.trustrank(edges, seeds).collect()}
    assert out[1]["is_seed"] == 1 and out[2]["is_seed"] == 0
    assert out[1]["rank"] > 0 and out[2]["rank"] > 0 and out[3]["rank"] > 0
    assert out[2]["rank"] > out[3]["rank"]  # one hop beats two
    assert out[10]["rank"] == 0 and out[11]["rank"] == 0  # unreachable farm

    # independent integer replay
    SCALE, D_, T = 10**12, 85, 3
    nodes = sorted({s for s, _ in edges_rows} | {d for _, d in edges_rows})
    outd = {v: 0 for v in nodes}
    for s, _ in edges_rows:
        outd[s] += 1
    ns = 1
    rank = {v: (SCALE // ns if v == 1 else 0) for v in nodes}
    tele = (100 - D_) * SCALE // 100
    for _ in range(T):
        dang = sum(rank[v] for v in nodes if outd[v] == 0)
        inflow = {v: 0 for v in nodes}
        for s, d in edges_rows:
            inflow[d] += rank[s] // outd[s]
        rank = {
            v: (tele // ns + (D_ * (dang // ns)) // 100 if v == 1 else 0)
            + (D_ * inflow[v]) // 100
            for v in nodes
        }
    for v in nodes:
        assert out[v]["rank"] == rank[v], (v, out[v]["rank"], rank[v])

    # seeds not present in the graph are ignored (no divide-by-extra)
    seeds2 = spark.createDataFrame([(1,), (999,)], "id long")
    out2 = {r["id"]: r["rank"] for r in G.trustrank(edges, seeds2).collect()}
    assert out2 == {v: r["rank"] for v, r in out.items()}


def test_hyperball_harmonic_matches_exact_bfs(spark):
    """HyperBall harmonic centrality vs exact BFS on a small graph:
    estimates within HLL small-range accuracy, ordering preserved
    (the hub everything links to scores highest), radius truncation
    respected, and the run is partitioning-invariant."""
    # star into 1 (nodes 2..6 -> 1), chain 7 -> 2, isolated pair 8 -> 9
    edge_rows = [(2, 1), (3, 1), (4, 1), (5, 1), (6, 1), (7, 2), (8, 9)]
    edges = spark.createDataFrame(edge_rows, "src long, dst long")

    def exact_harmonic(radius):
        # reversed reach: d(u, v) over edges u->v
        import collections

        nodes = sorted({s for s, _ in edge_rows} | {d for _, d in edge_rows})
        adj_rev = collections.defaultdict(list)  # v <- its in-neighbors
        for s, d in edge_rows:
            adj_rev[d].append(s)
        H = {}
        for v in nodes:
            dist = {v: 0}
            frontier = [v]
            r = 0
            while frontier and r < radius:
                r += 1
                nxt = []
                for x in frontier:
                    for u in adj_rev[x]:
                        if u not in dist:
                            dist[u] = r
                            nxt.append(u)
                frontier = nxt
            H[v] = sum(1.0 / d for u, d in dist.items() if d > 0)
        return H

    want = exact_harmonic(3)
    for parts in (1, 5):
        got = {
            r["id"]: r
            for r in G.hyperball_harmonic(
                G.normalize_edges(edges.repartition(parts)), radius=3
            ).collect()
        }
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v]["harmonic"] - want[v]) <= max(
                0.25, 0.2 * want[v]
            ), (v, got[v]["harmonic"], want[v])
        # ordering: the hub beats everything else
        assert got[1]["harmonic"] == max(g["harmonic"] for g in got.values())
        assert got[8]["harmonic"] == 0.0  # nothing reaches 8

    # determinism across partitionings is exact, not just within error
    a = {
        r["id"]: r["harmonic"]
        for r in G.hyperball_harmonic(
            G.normalize_edges(edges.repartition(1)), radius=3
        ).collect()
    }
    b = {
        r["id"]: r["harmonic"]
        for r in G.hyperball_harmonic(
            G.normalize_edges(edges.repartition(5)), radius=3
        ).collect()
    }
    assert a == b


def test_hits_hubs_and_authorities(spark):
    """HITS: an integer-trajectory replay pins the exact values; the
    page everything links to is the top authority, the page linking to
    everything is the top hub, and runs are partitioning-invariant."""
    # 1 and 2 are hubs pointing at authorities 10, 11; 1 also hits 12
    edge_rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 1)]
    edges = spark.createDataFrame(edge_rows, "src long, dst long")

    NT, T = 1 << 20, 3
    nodes = sorted({s for s, _ in edge_rows} | {d for _, d in edge_rows})
    h = {v: NT for v in nodes}
    a = {v: NT for v in nodes}

    def rescale(d):
        # Pure-integer reference (scores are non-negative, so // is
        # floor): mirrors the engine's `(score * NT) div m` exactly —
        # no float division, no 2^53 cliff.
        m = max(abs(x) for x in d.values())
        return d if m == 0 else {k: (v * NT) // m for k, v in d.items()}

    for _ in range(T):
        a = rescale(
            {v: sum(h[s] for s, d in edge_rows if d == v) for v in nodes}
        )
        h = rescale(
            {v: sum(a[d] for s, d in edge_rows if s == v) for v in nodes}
        )

    for parts in (1, 7):
        got = {
            r["id"]: r
            for r in G.hits(
                G.normalize_edges(edges.repartition(parts)), iterations=T
            ).collect()
        }
        for v in nodes:
            assert got[v]["hub"] == h[v], (parts, v)
            assert got[v]["authority"] == a[v], (parts, v)
        hubs = {v: got[v]["hub"] for v in nodes}
        auths = {v: got[v]["authority"] for v in nodes}
        assert max(hubs, key=hubs.get) == 1      # links to all three
        assert auths[10] == max(auths.values())  # two hubs point at 10
        assert auths[10] == auths[11] and auths[10] > auths[12]


def test_graph_summary(spark):
    edge_rows = [(1, 2), (2, 1), (1, 3), (3, 4), (5, 1)]
    edges = G.normalize_edges(
        spark.createDataFrame(edge_rows, "src long, dst long")
    )
    row = G.graph_summary(edges).collect()[0]
    assert row["n_nodes"] == 5 and row["n_edges"] == 5
    assert row["max_out_degree"] == 2  # node 1
    assert row["n_dangling"] == 1  # node 4
    assert row["reciprocity_permille"] == 1000 * 2 // 5  # the 1<->2 pair
