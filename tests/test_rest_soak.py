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
