"""Concurrency soak for the serving path: N REST clients hammer the
live serving table while the upstream stream commits new batches,
stops (simulated instance failure), restarts from its checkpoint, and
commits again — the Spark analog of the reference's flagship scenario
of two app instances answering queries during failover
(InteractiveQueriesIntegrationTest.java:100-158).

Invariants asserted across every concurrent request:
- no 5xx: every response is a well-formed 200 envelope;
- snapshot isolation: every observed aggregate value is one of the
  COMMITTED versions (never a torn/partial state);
- monotone versions: per client, observed values only move forward
  through the commit history, never backward.
"""

import datetime as dt
import threading

import pytest

from kafkastreamsinteractivequeries_spark.plans.service import (
    LiveSnapshotQueryService,
)
from kafkastreamsinteractivequeries_spark.schemas import STOCK_TRANSACTION_SCHEMA
from kafkastreamsinteractivequeries_spark.serving.rest import create_app
from kafkastreamsinteractivequeries_spark.streaming.pipeline import (
    ManifestServingSink,
    file_transaction_stream,
    start_transactional_serving_pipeline,
)

# excluded from the default gate (REST serving soak); see pytest.ini
pytestmark = pytest.mark.slow

flask = pytest.importorskip("flask")

T0 = dt.datetime(2024, 1, 1, 9, 30)


def _buy(shares: int, hour: int):
    return ("CFLT", True, 100.0 * shares, shares, T0 + dt.timedelta(hours=hour))


def test_rest_concurrent_queries_across_restart(spark, tmp_path):
    txn_dir = str(tmp_path / "txns")
    serving = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")

    # committed CFLT share totals after each batch: 10, then +20, +30
    spark.createDataFrame(
        [_buy(10, 0), ("ZELK", False, 50.0, 5, T0)], STOCK_TRANSACTION_SCHEMA
    ).coalesce(1).write.parquet(txn_dir)
    q = start_transactional_serving_pipeline(
        file_transaction_stream(spark, txn_dir), serving, ckpt
    )
    q.processAllAvailable()

    sink = ManifestServingSink(serving)
    app = create_app(LiveSnapshotQueryService(spark, sink))
    app.config["TESTING"] = True

    committed_versions = [10, 30, 60]  # cumulative share counts
    stop = threading.Event()
    results: list[dict] = []

    def client_loop(idx: int) -> None:
        client = app.test_client()
        seen: list[int] = []
        bad: list[tuple] = []
        while not stop.is_set() or not seen:
            r = client.get("/streams-iq/keyquery/CFLT")
            if r.status_code != 200:
                bad.append(("status", r.status_code, r.get_json()))
                continue
            env = r.get_json()
            if env["errorMessage"]:
                bad.append(("error", env["errorMessage"]))
                continue
            rows = env["result"]
            if len(rows) != 1:
                bad.append(("rows", rows))
                continue
            seen.append(int(rows[0]["number_shares"]))
        results.append({"idx": idx, "seen": seen, "bad": bad})

    threads = [threading.Thread(target=client_loop, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()

    try:
        # commit a second batch while clients are querying
        spark.createDataFrame([_buy(20, 1)], STOCK_TRANSACTION_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(txn_dir)
        q.processAllAvailable()
        # simulated instance failure: stop the stream mid-queries...
        q.stop()
        # ...append during the outage, then recover from the checkpoint
        spark.createDataFrame([_buy(30, 2)], STOCK_TRANSACTION_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(txn_dir)
        q2 = start_transactional_serving_pipeline(
            file_transaction_stream(spark, txn_dir), serving, ckpt
        )
        q2.processAllAvailable()
        q2.stop()
        # prove the outage healed THROUGH the serving API before
        # releasing the clients — a racing client thread isn't
        # guaranteed another iteration after the final commit, so the
        # main thread observes the healed snapshot itself
        import time as _time

        deadline = _time.time() + 60
        healed = None
        probe = app.test_client()
        while _time.time() < deadline:
            rows = probe.get("/streams-iq/keyquery/CFLT").get_json()["result"]
            if rows and int(rows[0]["number_shares"]) == 60:
                healed = 60
                break
            _time.sleep(0.2)
        assert healed == 60, "serving table never exposed the post-restart commit"
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)

    assert len(results) == 6
    for res in results:
        assert not res["bad"], f"client {res['idx']} saw failures: {res['bad'][:3]}"
        assert res["seen"], f"client {res['idx']} never completed a query"
        # snapshot isolation: only committed versions are observable
        assert set(res["seen"]) <= set(committed_versions), res["seen"][:10]
        # monotone: versions never move backward within a client
        assert res["seen"] == sorted(res["seen"]), (
            f"client {res['idx']} observed a version rollback"
        )
    # untouched key survived every upsert + the restart
    client = app.test_client()
    zelk = client.get("/streams-iq/keyquery/ZELK").get_json()["result"]
    assert len(zelk) == 1 and zelk[0]["number_shares"] == 5


def test_rest_training_stores_live_snapshot(spark, tmp_path):
    """The /training/store/<name> surface over the north-star landed
    stores: the quantile-telemetry sketch serves the latest COMMITTED
    snapshot while the ingest stream commits a second batch (same
    no-5xx / committed-versions-only / monotone invariants as the
    reference-surface soak), and the packing-efficiency datasheet
    serves its bounded per-shard rows through the same envelope."""
    import time as _time

    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        hashed_quantile_estimates,
    )
    from kafkastreamsinteractivequeries_spark.operators.training import (
        packing_stats,
        token_training_examples,
    )
    from kafkastreamsinteractivequeries_spark.plans.service import (
        InteractiveQueryService,
    )
    from kafkastreamsinteractivequeries_spark.streaming.pipeline import (
        StreamingQuantileSketchSink,
    )

    src = str(tmp_path / "vals")
    store = str(tmp_path / "qstore")
    ckpt = str(tmp_path / "qckpt")
    spark.range(100).select(F.col("id").alias("v")).coalesce(1).write.parquet(src)

    sink = StreamingQuantileSketchSink(store, "v", k=64)

    def ingest():
        q = (
            spark.readStream.schema("v long")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ingest()
    est = lambda: hashed_quantile_estimates(sink.sketch(spark), (50,))
    v1 = est().collect()[0]["n_est"]

    # a static token-id bin table backing the packing datasheet store
    ids = spark.createDataFrame(
        [(1, [5, 6, 7, 3], 4), (2, [8, 9, 3], 3), (3, [4] * 7 + [3], 8)],
        "doc_id long, token_ids array<int>, n_ids int",
    )
    sheet = packing_stats(token_training_examples(ids, seq_len=8, shards=2), 8)

    serving = spark.createDataFrame(
        [("CFLT", 1.0, 2.0, 3)], "symbol string, buys double, sells double, number_shares long"
    )
    app = create_app(
        InteractiveQueryService(serving, key_col="symbol"),
        training_tables={"quantiles": est, "packing": lambda: sheet},
    )
    app.config["TESTING"] = True

    listing = app.test_client().get("/training/stores").get_json()
    assert listing == {"stores": ["packing", "quantiles"], "count": 2}

    stop = threading.Event()
    results: list[dict] = []

    def client_loop(idx: int) -> None:
        client = app.test_client()
        seen: list[int] = []
        bad: list[tuple] = []
        while not stop.is_set() or not seen:
            r = client.get("/training/store/quantiles")
            if r.status_code != 200:
                bad.append(("status", r.status_code, r.get_json()))
                continue
            env = r.get_json()
            if env["errorMessage"] or len(env["result"]) != 1:
                bad.append(("env", env))
                continue
            seen.append(int(env["result"][0]["n_est"]))
        results.append({"idx": idx, "seen": seen, "bad": bad})

    threads = [threading.Thread(target=client_loop, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    try:
        # second commit while clients read the live store
        spark.range(100, 150).select(F.col("id").alias("v")).coalesce(
            1
        ).write.mode("append").parquet(src)
        ingest()
        v2 = est().collect()[0]["n_est"]
        deadline = _time.time() + 60
        probe = app.test_client()
        while _time.time() < deadline:
            got = probe.get("/training/store/quantiles").get_json()["result"]
            if got and int(got[0]["n_est"]) == v2:
                break
            _time.sleep(0.2)
        else:
            raise AssertionError("store never exposed the second commit")
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)

    assert v1 != v2  # the second commit actually changed the telemetry
    for res in results:
        assert not res["bad"], f"client {res['idx']}: {res['bad'][:3]}"
        assert set(res["seen"]) <= {v1, v2}, res["seen"][:10]
        assert res["seen"] == sorted(res["seen"], key=[v1, v2].index)

    # the datasheet store: bounded per-shard rows through the envelope
    sheet_rows = app.test_client().get("/training/store/packing").get_json()
    assert not sheet_rows["errorMessage"]
    assert {r["shard"] for r in sheet_rows["result"]} == {0, 1}
    # unknown store -> 404 envelope; keyset cursor -> 400
    assert app.test_client().get("/training/store/nope").status_code == 404
    assert (
        app.test_client().get("/training/store/packing?after=x").status_code
        == 400
    )
