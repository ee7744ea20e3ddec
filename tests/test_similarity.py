"""Similarity-search operator tests: cosine correctness vs numpy,
SRP-LSH candidate behavior, top-k semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from kafkastreamsinteractivequeries_spark.operators.similarity import (
    cosine_expr,
    embedding_near_duplicates,
    knn_bruteforce,
    knn_srp,
    srp_band_buckets,
    srp_codes,
    srp_sign_matrix,
)

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype(np.float32)
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=64).astype(np.float32)  # near-dup of 0
    vecs[2] = -vecs[0]  # anti-parallel
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(40)]
    return spark.createDataFrame(rows, EMB_SCHEMA), vecs


@pytest.mark.slow  # >10 s; runs in the full suite
def test_cosine_matches_numpy(spark, emb):
    df, vecs = emb
    a = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("a"))
    b = df.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("b"))
    got = a.crossJoin(b).select(cosine_expr(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    va, vb = vecs[0].astype(np.float64), vecs[1].astype(np.float64)
    want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    assert got == pytest.approx(want, abs=1e-9)


def test_knn_bruteforce_topk(spark, emb):
    df, vecs = emb
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = knn_bruteforce(df, queries, k=5).collect()
    assert len(got) == 5
    ranks = {r.rank: r.vec_id for r in got}
    assert ranks[1] == 1  # the injected near-dup is nearest
    assert all(r.vec_id != 0 for r in got)  # self excluded
    # ranks ordered by cosine desc
    by_rank = sorted(got, key=lambda r: r.rank)
    assert all(
        by_rank[i].cosine >= by_rank[i + 1].cosine for i in range(len(by_rank) - 1)
    )
    # matches numpy exact top-1
    V = vecs.astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn[0]
    sims[0] = -2
    assert int(np.argmax(sims)) == 1


def test_srp_sign_matrix_deterministic():
    assert srp_sign_matrix(4, 8) == srp_sign_matrix(4, 8)
    assert all(s in (-1, 1) for row in srp_sign_matrix(4, 8) for s in row)


def test_srp_codes_shape(spark, emb):
    df, _ = emb
    codes = srp_codes(df).collect()
    assert all(len(r.code) == 16 and set(r.code) <= {"0", "1"} for r in codes)
    by_id = {r.vec_id: r.code for r in codes}
    # near-identical vectors share the code; anti-parallel flips every bit
    assert by_id[0] == by_id[1]
    assert all(a != b for a, b in zip(by_id[0], by_id[2]))


def test_srp_band_buckets(spark, emb):
    df, _ = emb
    buckets = srp_band_buckets(srp_codes(df), chunks=4).collect()
    assert len(buckets) == 40 * 4
    assert all(len(r.band_bits) == 4 for r in buckets)


def test_embedding_near_duplicates_finds_pair(spark, emb):
    df, _ = emb
    got = {(r.id_a, r.id_b): r.cosine for r in embedding_near_duplicates(df, threshold=0.9).collect()}
    assert (0, 1) in got and got[(0, 1)] > 0.99
    # anti-parallel pair never appears
    assert (0, 2) not in got


def test_srp_planes_for_scales_with_corpus():
    from kafkastreamsinteractivequeries_spark.operators.similarity import srp_planes_for

    # floor: tiny corpora keep the 4-bit minimum
    assert srp_planes_for(40) == 16
    assert srp_planes_for(4096) == 16
    # expected occupancy n / 2^bits stays ≈ target as n grows
    assert srp_planes_for(65536) == 4 * 8  # 2^8 buckets -> 256/bucket
    assert srp_planes_for(2**24) == 4 * 16
    # monotone non-decreasing, capped
    sizes = [10**k for k in range(2, 12)]
    planes = [srp_planes_for(n) for n in sizes]
    assert planes == sorted(planes)
    assert max(planes) == 4 * 24
    # chunks scales the plane count, not the band bits
    assert srp_planes_for(65536, chunks=8) == 8 * 8


def test_near_duplicates_dropped_bucket_stats(spark, emb):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        dropped_bucket_stats,
    )

    df, _ = emb
    # cap of 1 forces every bucket with >1 member to drop
    res = embedding_near_duplicates(df, threshold=0.9, max_bucket_size=1)
    assert res.count() == 0  # near-dup pair 0/1 shares its buckets -> dropped
    stats = dropped_bucket_stats(res)
    assert stats is not None and stats["dropped_rows"] > 0
    assert 0 < stats["fraction"] <= 1

    # generous cap: nothing dropped, fraction 0, pair found
    res2 = embedding_near_duplicates(df, threshold=0.9, max_bucket_size=4096)
    assert (0, 1) in {(r.id_a, r.id_b) for r in res2.collect()}
    stats2 = dropped_bucket_stats(res2)
    assert stats2 == {"dropped_rows": 0, "total_rows": stats2["total_rows"], "fraction": 0.0}
    assert stats2["total_rows"] > 0

    # cap disabled -> no observation
    res3 = embedding_near_duplicates(df, threshold=0.9, max_bucket_size=None)
    assert dropped_bucket_stats(res3) is None


def test_knn_srp_subset_of_bruteforce_candidates(spark, emb):
    df, _ = emb
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = knn_srp(df, queries, k=40)
    exact = knn_bruteforce(df, queries, k=40)
    a = {r.vec_id for r in approx.collect()}
    e = {r.vec_id for r in exact.collect()}
    assert a <= e  # candidates only (approximate ⊆ exact universe)
    assert 1 in a  # the true near-dup shares all bands → always found


def test_no_python_in_knn_plan(spark, emb):
    df, _ = emb
    queries = df.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = knn_bruteforce(df, queries)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ivf_assign_covers_corpus(spark, sf_dir):
    from kafkastreamsinteractivequeries_spark.operators.similarity import ivf_assign
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assign = ivf_assign(emb, n_lists=16)
    rows = assign.collect()
    assert len(rows) == emb.count()  # every vector lands in exactly one list
    lists = {r.list_id for r in rows}
    assert lists <= set(range(16)) and len(lists) > 1
    # a centroid's own nearest centroid is itself (cosine 1.0)
    by_id = {r.vec_id: r.list_id for r in rows}
    for cid in range(16):
        assert by_id[cid] == cid


def test_knn_ivf_recall_against_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id) for r in knn_bruteforce(emb, queries, k=10).collect()
    }
    approx = {(r.query_id, r.vec_id) for r in knn_ivf(emb, queries, k=10, nprobe=4).collect()}
    # nprobe=4/16 lists: recall is approximate by design but must be
    # non-trivial, and every IVF hit must be a real vector pair
    assert len(approx & exact) / len(exact) > 0.2
    assert all(q != v for q, v in approx)


def test_ivf_train_recovers_separated_clusters(spark):
    """Lloyd training on 3 well-separated clusters: every trained
    centroid lands in one cluster, assignments agree with true labels,
    and quantization error (mean 1 - cosine-to-assigned-centroid)
    improves on the untrained seed quantizer."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        cosine_from_parts,
        ivf_assign,
        ivf_centroids,
        ivf_train,
        norm_expr,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 16)).astype(np.float32) * 5
    rows = []
    for i in range(60):
        c = i % 3
        v = centers[c] + rng.normal(scale=0.2, size=16).astype(np.float32)
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(rows, EMB_SCHEMA)

    def quant_err(cent):
        assigned = ivf_assign(df, 3, centroids=cent)
        joined = (
            df.join(assigned, "vec_id")
            .join(
                cent.withColumnRenamed("centroid_id", "list_id"),
                "list_id",
            )
            .select(
                (
                    1
                    - cosine_from_parts(
                        F.col("embedding"),
                        F.col("centroid_vec"),
                        norm_expr(F.col("embedding")),
                        F.col("_nc"),
                    )
                ).alias("err")
            )
        )
        return joined.agg(F.avg("err")).collect()[0][0]

    seed = ivf_centroids(df, 3).withColumn("_nc", F.col("_nc"))
    trained = ivf_train(df, 3, iterations=4)
    assert quant_err(trained) <= quant_err(seed) + 1e-9

    # each trained centroid is essentially one true center (cos > 0.99)
    got = {r.centroid_id: np.array(r.centroid_vec) for r in trained.collect()}
    assert len(got) == 3
    matched = set()
    for cv in got.values():
        sims = [
            float(np.dot(cv, c) / (np.linalg.norm(cv) * np.linalg.norm(c)))
            for c in centers
        ]
        best = int(np.argmax(sims))
        assert sims[best] > 0.99
        matched.add(best)
    assert matched == {0, 1, 2}

    # assignments are consistent with true labels (pure partition)
    assigned = ivf_assign(df, 3, centroids=trained)
    pairs = {(r.label, r.list_id) for r in df.join(assigned, "vec_id").collect()}
    by_label = {}
    for label, lst in pairs:
        by_label.setdefault(label, set()).add(lst)
    assert all(len(v) == 1 for v in by_label.values())
    assert len({next(iter(v)) for v in by_label.values()}) == 3


def test_pq_adc_approximates_exact_l2_on_separated_data(spark):
    """PQ pipeline end-to-end: codebooks train, every vector gets m
    codes, and ADC top-1 matches exact squared-L2 top-1 for all queries
    on cluster-structured data (quantization error is small relative to
    cluster separation)."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        knn_pq_adc,
        pq_codes,
        pq_train,
    )

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 16)).astype(np.float32) * 6
    vecs = np.stack(
        [centers[i % 4] + rng.normal(scale=0.15, size=16).astype(np.float32) for i in range(40)]
    )
    rows = [(i, [float(x) for x in vecs[i]], i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)

    book = pq_train(df, m=4, k=4, iterations=4, dim=16)
    assert book.count() == 16  # m x k codebook entries

    codes = {r.vec_id: r.codes for r in pq_codes(df, book, m=4, dim=16).collect()}
    assert len(codes) == 40 and all(len(c) == 4 for c in codes.values())
    # same-cluster vectors share codes far more than cross-cluster
    same = [codes[i] == codes[i + 4] for i in range(4)]
    assert all(same)

    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        r.query_id: r.vec_id
        for r in knn_pq_adc(df, queries, book, k=1, m=4, dim=16).collect()
    }
    for qid, nn in got.items():
        dists = ((vecs - vecs[qid]) ** 2).sum(axis=1)
        dists[qid] = np.inf
        exact = int(np.argmin(dists))
        # ADC's winner must be in the same cluster as the exact winner
        assert nn % 4 == exact % 4 == qid % 4


def test_ann_recall_floor(spark, sf_dir):
    """Pin the recall-tuned defaults to the stated >=0.95 recall@10
    floor (SCALING.md): srp (48 planes / 16 bands), ivf (nprobe=12),
    and the PQ rerank path (m=16, k=32, it=3, rerank=200), all against
    the exact brute-force baseline on the uniform-sphere corpus — the
    ANN worst case (no cluster structure, weak-cosine neighbors)."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
        knn_pq_adc,
        knn_srp,
        pq_train,
        recall_at_k,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_bruteforce(emb, queries, k=10).localCheckpoint()
    assert recall_at_k(exact, knn_srp(emb, queries, k=10)) >= 0.95
    assert recall_at_k(exact, knn_ivf(emb, queries, k=10)) >= 0.95
    book = pq_train(emb, m=16, k=32, iterations=3)
    assert (
        recall_at_k(exact, knn_pq_adc(emb, queries, book, k=10, m=16, rerank=200))
        >= 0.95
    )


def test_index_save_load_roundtrip_preserves_knn_results(spark, sf_dir, tmp_path):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        ivf_train,
        knn_ivf,
        knn_pq_adc,
        load_ivf_centroids,
        load_pq_codebook,
        pq_train,
        save_index,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    cents = ivf_train(emb, n_lists=8, iterations=2)
    ivf_path = str(tmp_path / "ivf_index")
    save_index(cents, ivf_path)
    fresh = knn_ivf(emb, queries, k=5, n_lists=8, nprobe=3, centroids=cents)
    loaded = knn_ivf(
        emb, queries, k=5, n_lists=8, nprobe=3,
        centroids=load_ivf_centroids(spark, ivf_path),
    )
    assert sorted(map(tuple, fresh.collect())) == sorted(map(tuple, loaded.collect()))

    book = pq_train(emb, m=8, k=16, iterations=2)
    pq_path = str(tmp_path / "pq_index")
    save_index(book, pq_path)
    fresh_pq = knn_pq_adc(emb, queries, book, k=5, m=8)
    loaded_pq = knn_pq_adc(emb, queries, load_pq_codebook(spark, pq_path), k=5, m=8)
    assert sorted(map(tuple, fresh_pq.collect())) == sorted(map(tuple, loaded_pq.collect()))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a PQ codebook"):
        load_pq_codebook(spark, ivf_path)
    with _pytest.raises(ValueError, match="not an IVF centroid"):
        load_ivf_centroids(spark, pq_path)


def test_encode_all_fuses_three_encoders_in_one_map_only_scan(spark, sf_dir):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        encode_all,
        ivf_assign,
        ivf_train,
        pq_codes,
        pq_train,
        srp_codes,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train(emb, n_lists=8, iterations=2)
    book = pq_train(emb, m=8, k=16, iterations=2)
    fused = encode_all(emb, centroids=cents, codebook=book, num_planes=16)
    got = {r["vec_id"]: r for r in fused.collect()}

    srp = {r["vec_id"]: r["code"] for r in srp_codes(emb, num_planes=16).collect()}
    ivf = {r["vec_id"]: r["list_id"] for r in ivf_assign(emb, n_lists=8, centroids=cents).collect()}
    pq = {r["vec_id"]: list(r["codes"]) for r in pq_codes(emb, book, m=8).collect()}

    assert set(got) == set(srp)
    for vid, row in got.items():
        assert row["srp_code"] == srp[vid], vid
        assert row["list_id"] == ivf[vid], vid
        assert list(row["pq_codes"]) == pq[vid], vid

    # the whole thing is ONE projection: no joins, no aggregation, no
    # window — the only exchange is the spread() fan-out
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Window" not in plan
    # one spread() fan-out (AQE's plan dump may print it twice:
    # initial + final plan)
    assert plan.count("Exchange") <= 2


def test_pool_embeddings_mean_and_normalize(spark):
    import math

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        pool_embeddings,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 3.0]),
            (1, [3.0, 2.0, 1.0]),
            (2, [0.0, 4.0, 0.0]),
        ],
        "doc_id long, embedding array<float>",
    )
    out = {r["doc_id"]: list(r["embedding"]) for r in pool_embeddings(df).collect()}
    assert out[1] == [2.0, 1.0, 2.0]
    assert out[2] == [0.0, 4.0, 0.0]

    summed = {r["doc_id"]: list(r["embedding"]) for r in pool_embeddings(df, method="sum").collect()}
    assert summed[1] == [4.0, 2.0, 4.0]

    normed = {r["doc_id"]: list(r["embedding"]) for r in pool_embeddings(df, normalize=True).collect()}
    n1 = math.sqrt(sum(v * v for v in normed[1]))
    assert abs(n1 - 1.0) < 1e-6
    # direction preserved
    assert abs(normed[1][0] - 2.0 / 3.0) < 1e-6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pool_embeddings(df, method="max")


def test_pool_embeddings_zero_norm_stays_zero(spark):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        pool_embeddings,
    )

    # canceling chunks pool to the zero vector; normalization must not
    # NULL it out — the zero vector passes through unchanged
    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (1, [-1.0, 2.0])],
        "doc_id long, embedding array<float>",
    )
    out = pool_embeddings(df, normalize=True).collect()
    assert list(out[0]["embedding"]) == [0.0, 0.0]


def test_embedding_decontaminate_flags_paraphrase_neighbors(spark, emb):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_decontaminate,
    )

    df, vecs = emb
    # eval set: perturbed copies of corpus vectors 5 and 9 under new ids
    eval_rows = [
        (1000 + i, [float(x) + 0.005 * ((j % 3) - 1) for j, x in enumerate(vecs[i])])
        for i in (5, 9)
    ]
    eval_df = spark.createDataFrame(
        eval_rows, "eval_id long, embedding array<float>"
    )
    out = embedding_decontaminate(df, eval_df, threshold=0.9).collect()
    flagged = {(r.vec_id, r.eval_id) for r in out}
    assert (5, 1005) in flagged
    assert (9, 1009) in flagged
    assert all(r.cosine >= 0.9 for r in out)
    # unrelated random vectors must not be flagged at 0.9
    assert all(v in (5, 9) for v, _ in flagged)


def test_embedding_decontaminate_disjoint_sets_empty(spark, emb):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_decontaminate,
    )

    df, _ = emb
    rng = np.random.default_rng(99)
    eval_rows = [
        (2000 + i, [float(x) for x in rng.normal(size=64).astype(np.float32)])
        for i in range(3)
    ]
    eval_df = spark.createDataFrame(eval_rows, "eval_id long, embedding array<float>")
    assert embedding_decontaminate(df, eval_df, threshold=0.9).count() == 0


def test_embedding_decontaminate_never_shuffle_joins_eval_side(spark, emb):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_decontaminate,
    )

    df, vecs = emb
    eval_df = spark.createDataFrame(
        [(1000, [float(x) for x in vecs[0]])], "eval_id long, embedding array<float>"
    )
    plan = (
        embedding_decontaminate(df, eval_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the eval bucket table and eval vectors broadcast; the corpus is
    # never sort-merge-joined
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_embed_pool_search_composition(spark):
    """End-to-end RAG-prep loop: chunk documents → per-chunk vectors
    (deterministic fake embedder: token-count features) → mean-pool to
    doc vectors → brute-force kNN retrieves the semantically-matching
    document for a query built the same way."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        knn_bruteforce,
        pool_embeddings,
    )
    from kafkastreamsinteractivequeries_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(["apple banana cherry"] * 40)),
            (2, " ".join(["dog elephant fox"] * 40)),
            (3, " ".join(["apple banana cherry dog"] * 40)),
        ],
        ["doc_id", "text"],
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    assert chunks.groupBy("doc_id").count().filter("count > 1").count() == 3

    # fake embedder: 8-dim token-hash histogram per chunk — pure Column
    # expressions, deterministic, stands in for the model call the
    # container can't run
    vocab_dim = 8
    emb = chunks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(vocab_dim - 1)),
            lambda d: F.size(
                F.filter(
                    F.split(F.col("chunk_text"), " "),
                    lambda t: F.pmod(F.abs(F.hash(t)), F.lit(vocab_dim)) == d,
                )
            ).cast("float"),
        ).alias("embedding"),
    )
    pooled = pool_embeddings(emb, id_col="doc_id", normalize=True).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    query = spark.createDataFrame([(100, "apple banana cherry")], ["qid", "qtext"])
    qvec = query.select(
        F.col("qid").alias("query_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(vocab_dim - 1)),
            lambda d: F.size(
                F.filter(
                    F.split(F.col("qtext"), " "),
                    lambda t: F.pmod(F.abs(F.hash(t)), F.lit(vocab_dim)) == d,
                )
            ).cast("float"),
        ).alias("query_vec"),
    )
    top = knn_bruteforce(
        pooled, qvec, k=3, exclude_self=False
    ).orderBy("rank").collect()
    # doc 1 is the pure match, doc 3 partial, doc 2 disjoint
    assert top[0].vec_id == 1
    assert top[0].cosine > top[1].cosine >= top[2].cosine
    assert top[1].vec_id == 3


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. arXiv:2303.09540): cluster-then-prune semantic dedup
# ---------------------------------------------------------------------------


def _angle_vec(deg: float) -> list[float]:
    import math

    r = math.radians(deg)
    return [math.cos(r), math.sin(r), 0.0, 0.0]


def test_semdedup_transitive_group_keeps_farthest_from_centroid(spark):
    """Controlled geometry: ids 0-3 are the 4 basis centroids; ids
    10/11/12 sit at 0/7/14 degrees inside cluster 0.  At threshold
    0.99 (cos 7 deg = .9925 >= t, cos 14 deg = .9703 < t) the dup
    relation is a CHAIN 10-11-12 whose transitive closure is one
    group; the paper's keep rule retains the member FARTHEST from the
    centroid (id 12), and the singleton in cluster 1 is not emitted."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 1.0, 0.0], 0),
        (3, [0.0, 0.0, 0.0, 1.0], 0),
        (10, _angle_vec(0.0), 0),
        (11, _angle_vec(7.0), 0),
        (12, _angle_vec(14.0), 0),
        (20, [0.1, 0.9, 0.3, 0.0], 0),  # cluster 1, no neighbor
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = semdedup(df, n_lists=4, threshold=0.99).collect()
    by_id = {r.vec_id: r for r in out}
    # chain members (plus centroid 0 itself at 0 deg joins the group:
    # cos(c0, id10) = 1 >= t) — the centroid seed IS a corpus vector
    assert set(by_id) == {0, 10, 11, 12}
    assert len({r.group_id for r in out}) == 1
    assert all(r.list_id == 0 for r in out)
    # keep = lowest centroid cosine = the 14-degree member
    assert by_id[12].keep and not by_id[10].keep and not by_id[11].keep
    assert by_id[0].centroid_cosine == pytest.approx(1.0)
    # survivors = corpus minus emitted drop set
    dropped = {r.vec_id for r in out if not r.keep}
    assert dropped == {0, 10, 11}


def test_semdedup_cluster_cap_bounds_the_quadratic_corner(spark):
    """max_cluster_size=1 drops every cluster from pair generation —
    the backstop that keeps one adversarial hot cluster from going
    quadratic at scale; result is empty, never an error."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import semdedup

    rows = [(i, _angle_vec(float(i % 3)), 0) for i in range(30)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    assert semdedup(df, n_lists=4, threshold=0.99, max_cluster_size=1).count() == 0
    # Uncapped on the same input: the first 3 vectors (0/1/2 degrees)
    # seed three centroids, so each angle becomes its OWN cluster and
    # the cross-angle near-dups (cos 1 deg = .99985 >= t) are never
    # compared — the paper's documented approximation: recall is
    # bounded by cluster granularity.  Within-cluster exact dups still
    # collapse: 3 groups of 10, one survivor each.
    out = semdedup(df, n_lists=4, threshold=0.99, max_cluster_size=None).collect()
    assert len({r.group_id for r in out}) == 3
    assert len(out) == 30 and sum(1 for r in out if r.keep) == 3


def test_semdedup_local_components_equal_star(spark, sf_dir):
    """components='local' (per-cluster union-find, one shuffle) must be
    row-identical to the global star iteration — the contract that lets
    semdedup skip every driver-coordinated round.  Run on the real
    embeddings table so multi-member transitive chains exist, plus a
    chain-within-cluster shape (a-b, b-c share a cluster: transitivity
    must survive the group-local algorithm)."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import semdedup
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = semdedup(emb, n_lists=8, threshold=0.3, components="star").orderBy(
        "vec_id"
    ).collect()
    b = semdedup(emb, n_lists=8, threshold=0.3, components="local").orderBy(
        "vec_id"
    ).collect()
    assert a == b and len(a) > 0
    # chain transitivity inside one cluster: 0≈1 (1 deg), 1≈2 (1 deg),
    # 0..2 spread 2 deg — all one group under threshold cos(1.5deg)
    import math

    t = math.cos(math.radians(1.5))
    rows = [(i, _angle_vec(float(i)), 0) for i in range(3)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = semdedup(df, n_lists=1, threshold=t, components="local").collect()
    assert {r.group_id for r in out} == {0} and len(out) == 3
    # uncapped clusters auto-fall back to the star path (bounded
    # executor memory has priority over round elimination)
    unc = semdedup(df, n_lists=1, threshold=t, max_cluster_size=None).collect()
    assert sorted((r.vec_id, r.group_id) for r in unc) == sorted(
        (r.vec_id, r.group_id) for r in out
    )


def test_connected_components_local_union_find(spark):
    """Direct contract: per-partition union-find returns component-min
    group ids; chains, singleton-free nodes, and multiple partitions."""
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        connected_components_local,
    )

    pairs = spark.createDataFrame(
        [
            # partition 0: chain 1-2-3 plus isolated pair 10-11
            (0, 1, 2), (0, 2, 3), (0, 10, 11),
            # partition 1: star around 20
            (1, 20, 21), (1, 20, 22), (1, 22, 23),
        ],
        "list_id int, id_a bigint, id_b bigint",
    )
    got = {
        (r.doc_id, r.group_id)
        for r in connected_components_local(pairs, "list_id").collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_connected_components_null_edges_degrade(spark):
    """Corrupt edges with a null endpoint are dropped, never crash, and
    never emit phantom null component rows — in BOTH variants (the
    adversarial-input contract; a null id would crash the union-find's
    ordering and previously leaked a (NULL, NULL) row from the star
    variant's node union)."""
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        connected_components_local,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(0, None, 2), (0, 2, 3)], "list_id int, id_a bigint, id_b bigint"
    )
    loc = sorted(
        (r.doc_id, r.group_id)
        for r in connected_components_local(pairs, "list_id").collect()
    )
    st = sorted(
        (r.doc_id, r.group_id)
        for r in connected_components_star(pairs).collect()
    )
    assert loc == st == [(2, 2), (3, 2)]
    # empty edge set: empty result, no error
    empty = spark.createDataFrame([], "list_id int, id_a bigint, id_b bigint")
    assert connected_components_local(empty, "list_id").collect() == []


# ---------------------------------------------------------------------------
# int8 symmetric quantization — the 4x-smaller serving corpus
# ---------------------------------------------------------------------------


def test_int8_quantization_bounds_and_recall(spark, sf_dir):
    """Quantized components stay in [-127, 127] with the max-magnitude
    dim hitting ±127 exactly; cosine over int8 (scales cancel — pure
    integer dot products) holds ≥0.95 recall@10 vs float brute force on
    the uniform-sphere corpus (measured 0.985), and a zero vector
    survives under a unit scale instead of dividing by zero."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        knn_bruteforce,
        knn_int8,
        quantize_embeddings,
        recall_at_k,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb).localCheckpoint()
    bounds = q.select(
        F.max(F.array_max("qvec")).alias("mx"),
        F.min(F.array_min("qvec")).alias("mn"),
        F.min(F.array_max(F.transform("qvec", lambda v: F.abs(v)))).alias(
            "peak"
        ),
    ).collect()[0]
    assert bounds.mx <= 127 and bounds.mn >= -127
    assert bounds.peak == 127  # every vector's max-|dim| lands on ±127

    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qq = q.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "qvec"
    )
    exact = knn_bruteforce(emb, queries, k=10)
    assert recall_at_k(exact, knn_int8(q, qq, k=10)) >= 0.95

    zrow = spark.createDataFrame(
        [(999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    zq = quantize_embeddings(zrow).collect()[0]
    assert zq.scale == 1.0 and all(v == 0 for v in zq.qvec)


def test_nan_embeddings_never_match_or_rank(spark):
    """Spark ORDERS NaN greater than every value, so a NaN cosine
    would pass every >= threshold verify AND rank first in every
    top-k.  NaN cosines must become NULL and fall out of both paths;
    zero vectors (NULL via try_divide) likewise."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_near_duplicates,
        knn_bruteforce,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),            # zero vector
            (3, [0.9, 0.1, 0.0, 0.0]),
            (4, [float("nan"), 1.0, 0.0, 0.0]),   # corrupt vector
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<double>"
    )
    knn = knn_bruteforce(emb, q, k=4).collect()
    assert [r.vec_id for r in knn] == [0, 3]  # 1 and 4 excluded entirely
    assert all(not (r.cosine != r.cosine) for r in knn)  # no NaN survives

    pairs = embedding_near_duplicates(emb, threshold=0.5, num_planes=8).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 3)}


def test_ivfpq_rerank_recall_floor(spark, sf_dir):
    """The composed IVF-PQ index (residual codes, nprobe probing, exact
    rerank) must hit >= 0.9 recall@10 vs brute force — the production
    serving config."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        ivfpq_train,
        knn_bruteforce,
        knn_ivfpq,
        recall_at_k,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cent, book = ivfpq_train(emb, n_lists=16, m=8, k=16, iterations=2)
    # the sf0.001 corpus is 500 vectors, so the rerank budget (100 =
    # 20% of corpus) dominates recall here; at production scale the same
    # config touches a vanishing corpus fraction
    approx = knn_ivfpq(emb, qdf, cent, book, k=10, nprobe=8, rerank=100)
    exact = knn_bruteforce(emb, qdf, k=10)
    r = recall_at_k(approx, exact, k=10)
    assert r >= 0.9, f"ivfpq recall@10 = {r}"


def test_ivfpq_plan_broadcasts_index_and_prunes_lists(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        ivfpq_train,
        knn_ivfpq,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cent, book = ivfpq_train(emb, n_lists=8, m=8, k=16, iterations=1)
    plan = (
        knn_ivfpq(emb, qdf, cent, book, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus side must never shuffle-join against itself or the
    # index; tables/codebook/centroids ride broadcasts
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_residuals_reconstruct_vectors(spark, sf_dir):
    """residual + centroid recovers the original vector to float32
    precision."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        _residuals,
        ivf_centroids,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    cent = ivf_centroids(emb, 8)
    res = _residuals(emb, cent, "embedding", "vec_id")
    # float32 (a-b)+b is not exactly a; assert reconstruction within
    # one float32 ulp of the data's magnitude instead
    back = (
        res.join(
            cent.select(F.col("centroid_id").alias("list_id"), "centroid_vec"),
            "list_id",
        )
        .select(
            "vec_id",
            F.zip_with(
                "residual", "centroid_vec", lambda a, b: (a + b).cast("float")
            ).alias("rebuilt"),
        )
        .join(emb, "vec_id")
        .select(
            F.aggregate(
                F.zip_with(
                    "rebuilt", "embedding",
                    lambda a, b: F.abs(a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            ).alias("maxerr")
        )
        .agg(F.max("maxerr"))
        .collect()[0][0]
    )
    assert back < 1e-5, back


def test_ivfpq_prelanded_codes_match_inline_encode(spark, sf_dir):
    """knn_ivfpq(code_rows=ivfpq_codes(...)) — the deployment shape
    where the code table lands once at ingest — must return exactly
    the per-query inline-encode results."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        ivfpq_codes,
        ivfpq_train,
        knn_ivfpq,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cent, book = ivfpq_train(emb, n_lists=8, m=8, k=16, iterations=1)
    codes = ivfpq_codes(emb, cent, book).localCheckpoint(eager=False)
    inline = knn_ivfpq(emb, qdf, cent, book, k=5, nprobe=2, rerank=20)
    landed = knn_ivfpq(
        emb, qdf, cent, book, k=5, nprobe=2, rerank=20, code_rows=codes
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, landed.collect())
    )
    # the landed code table is n x m skinny rows, one per (vector, sub)
    n = emb.count()
    assert codes.count() == n * 8


def test_knn_union_cached_index_matches_fresh_training(spark, sf_dir):
    """The s1 train-once cache contract: loading quantizers saved by
    ensure_knn_indexes returns bit-identical kNN results to an in-key
    retrain (training is deterministic; parquet round-trips floats
    exactly).  This is what lets the bench time the serving path while
    the oracle keeps replaying the full training trajectory."""
    import __spark_entry__ as entry_mod
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        ivfpq_train,
        pq_train,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table, spread

    emb = spread(load_table(spark, sf_dir, "embeddings")).localCheckpoint(
        eager=False
    )
    fresh = {"pq_book": pq_train(emb, m=8, k=16, iterations=2)}
    cent_t, book_r = ivfpq_train(emb, n_lists=16, m=8, k=16, iterations=2)
    fresh["ivfpq_centroids"], fresh["ivfpq_book"] = cent_t, book_r
    from_fresh = entry_mod.knn_union(spark, sf_dir, index=fresh)
    from_cache = entry_mod.knn_union(spark, sf_dir)  # trains-if-absent, loads
    assert sorted(map(tuple, from_fresh.collect())) == sorted(
        map(tuple, from_cache.collect())
    )


def test_append_codes_equals_one_shot_encode(spark, sf_dir):
    """Incremental ANN ingest contract: encoding two corpus halves
    SEPARATELY against the frozen quantizers and unioning
    (append_pq_codes / append_ivfpq_codes) is bit-identical to the
    one-shot landed encode — codes are a pure function of (vector,
    quantizer), so ingest batching can never change the store."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        append_ivfpq_codes,
        append_pq_codes,
        ivfpq_codes,
        pq_codes,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    index = entry_mod.ensure_knn_indexes(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)

    appended = append_pq_codes(
        pq_codes(base, index["pq_book"], m=8), batch, index["pq_book"], m=8
    )
    got = {r["vec_id"]: list(r["codes"]) for r in appended.collect()}
    want = {r["vec_id"]: list(r["codes"]) for r in index["pq_codes"].collect()}
    assert got == want

    appended_r = append_ivfpq_codes(
        ivfpq_codes(base, index["ivfpq_centroids"], index["ivfpq_book"], m=8),
        batch,
        index["ivfpq_centroids"],
        index["ivfpq_book"],
        m=8,
    )
    got_r = sorted(map(tuple, appended_r.collect()))
    want_r = sorted(map(tuple, index["ivfpq_codes"].collect()))
    assert got_r == want_r


def test_reciprocal_rank_fusion_semantics(spark):
    """RRF: a doc ranked by BOTH systems outranks single-system docs
    with comparable ranks; scores are exact integers (1e9 div (60+r)
    summed) so fusion is bit-deterministic regardless of system order."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(12, 1), (13, 2), (14, 3)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in reciprocal_rank_fusion([a, b], k=5).collect()}
    # doc 12: 1e9//63 + 1e9//61 beats doc 10's 1e9//61 alone
    assert out[12]["rank"] == 1
    assert out[12]["rrf"] == 1_000_000_000 // 63 + 1_000_000_000 // 61
    assert out[10]["rrf"] == 1_000_000_000 // 61  # rank 1 in one system
    assert out[13]["rrf"] == 1_000_000_000 // 62  # rank 2 in one system
    # order of systems must not matter (integer sum is associative)
    swapped = {
        r["doc_id"]: r["rrf"]
        for r in reciprocal_rank_fusion([b, a], k=5).collect()
    }
    assert swapped == {d: r["rrf"] for d, r in out.items()}


def test_pca_power_iteration_matches_integer_reference(spark):
    """The fixed-point PCA trajectory is bit-identical to a pure-Python
    integer replay, and partitioning-invariant (the determinism
    contract a float covariance could never give)."""
    import math

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        pca_power_iteration,
    )

    # constructed corpus with a DOMINANT direction along dim 0+1
    rows = []
    for i in range(200):
        base = (i % 21 - 10) / 10.0
        vec = [base, 0.9 * base] + [((i * 7 + j) % 11 - 5) / 50.0 for j in range(6)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    DIMS, QS, SH, NT = 8, 1000, 20, 256
    pyvecs = [[math.floor(float(f) * QS) for f in v[:DIMS]]
              for _, v in rows]
    # re-quantize through float32 like the Spark column does
    import numpy as np

    pyvecs = [
        [math.floor(float(np.float32(f)) * QS) for f in v[:DIMS]]
        for _, v in rows
    ]
    n = len(pyvecs)
    s = [sum(r[j] for r in pyvecs) for j in range(DIMS)]
    C = [
        [
            (n * sum(r[j] * r[k] for r in pyvecs) - s[j] * s[k]) >> SH
            for k in range(DIMS)
        ]
        for j in range(DIMS)
    ]
    v, pv = [NT] * DIMS, [NT] * DIMS
    for _ in range(3):
        w = [sum(C[j][k] * v[k] for k in range(DIMS)) for j in range(DIMS)]
        m = max(abs(x) for x in w)
        pv, v = v, (w if m == 0 else [math.floor(x * NT / m) for x in w])

    for parts in (1, 7):
        got = {
            r["dim"]: r
            for r in pca_power_iteration(
                emb.repartition(parts), dims=DIMS, iterations=3
            ).collect()
        }
        assert [got[j]["v"] for j in range(DIMS)] == v, parts
        assert [got[j]["v_prev"] for j in range(DIMS)] == pv, parts

    # direction: dominant axis (1, 0.9, ~0) — cosine with the numpy
    # eigenvector of the float covariance must be high on this
    # well-separated spectrum
    X = np.array([vv[:DIMS] for _, vv in rows], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    top = evecs[:, -1]
    g = np.array(v, dtype=np.float64)
    cos = abs(g @ top) / (np.linalg.norm(g) * np.linalg.norm(top))
    assert cos > 0.99, cos


def test_pca_project_is_integer_dot(spark):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        pca_project,
    )

    emb = spark.createDataFrame(
        [(0, [0.5, -0.25]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["pc1"] for r in pca_project(emb, [2, 3]).collect()}
    assert out[0] == 500 * 2 + (-250) * 3
    assert out[1] == 1000 * 2 + 1000 * 3


def test_pca_skips_nan_rows(spark):
    """One NaN component must exclude the row, not poison the matrix."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        covariance_matrix_int,
    )

    clean = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, -0.1])],
        "vec_id long, embedding array<float>",
    )
    dirty = spark.createDataFrame(
        [(2, [float("nan"), 0.5]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    a = {(r["j"], r["k"]): r["c"]
         for r in covariance_matrix_int(clean, dims=2).collect()}
    b = {(r["j"], r["k"]): r["c"]
         for r in covariance_matrix_int(clean.unionByName(dirty), dims=2).collect()}
    assert a == b


def test_pca_top_components_deflation(spark):
    """Multi-component PCA via integer Hotelling deflation: both
    components align with numpy's eigenvectors on a two-dominant-
    direction corpus, and the integer trajectory is partitioning-
    invariant."""
    import numpy as np

    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        pca_top_components,
    )

    rows = []
    for i in range(300):
        a = (i % 21 - 10) / 10.0
        b = ((i * 7) % 17 - 8) / 16.0
        vec = [a, 0.9 * a + 0.1 * b, b, -0.8 * b] + [
            ((i * 11 + j) % 13 - 6) / 100.0 for j in range(4)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run(parts):
        out = pca_top_components(
            emb.repartition(parts), n_components=2, dims=8
        ).collect()
        comps = {}
        for r in out:
            comps.setdefault(r["component"], {})[r["dim"]] = r["v"]
        return comps

    a, b = run(1), run(9)
    assert a == b  # bit-deterministic across partitionings

    X = np.array([v for _, v in rows])
    Xc = X - X.mean(0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    for c in (0, 1):
        g = np.array([a[c][j] for j in range(8)], float)
        ref = evecs[:, -1 - c]
        cos = abs(g @ ref) / (np.linalg.norm(g) * np.linalg.norm(ref))
        assert cos > 0.99, (c, cos)

    try:
        pca_top_components(emb, n_components=0)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")
