"""Local mirror of the driver's DuckDB-oracle correctness gate:
run a ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compare row count, column names, and
order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb

from kafkastreamsinteractivequeries_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    # NULLs first within their column: None is not orderable against
    # other values, so key every cell as (is_not_null, value-or-0)
    return tuple((v is not None, v if v is not None else 0) for v in row)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(row[i]) for i in order) for row in rows), key=_sort_key
    )


def check_driver_compatible_types(con, sql: str) -> None:
    """The driver's value-hash is representation-sensitive: DuckDB HUGEINT
    (int128, e.g. SUM over integers) and DECIMAL outputs do not round-trip
    to the same representation as Spark's bigint/double, so rows that are
    numerically equal still hash-mismatch (observed on a10/x8 in round 2).
    Oracles must CAST such columns to BIGINT/DOUBLE.

    Timestamp outputs must also stay inside pandas' datetime64[ns] range
    (1677-09-21 .. 2262-04-11): the driver materializes both sides
    through pandas, and an out-of-range instant (the 9999-01-01 SCD2
    sentinel, round-5 e2 regression) throws OutOfBoundsDatetime in the
    driver's hands even though ``collect()`` handles it fine locally.
    Emit epoch-second longs (or an in-range sentinel) instead.
    """
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    bad = [
        (name, typ)
        for name, typ, *_ in desc
        if "HUGEINT" in typ or typ.startswith("DECIMAL")
    ]
    assert not bad, (
        f"oracle output has driver-hash-unsafe DuckDB types {bad}; "
        "CAST to BIGINT/DOUBLE in the oracle SQL"
    )
    ts_cols = [name for name, typ, *_ in desc if typ.startswith("TIMESTAMP")]
    if ts_cols:
        import pandas as pd

        lo, hi = pd.Timestamp.min.to_pydatetime(), pd.Timestamp.max.to_pydatetime()
        probes = ", ".join(f'min("{c}"), max("{c}")' for c in ts_cols)
        vals = con.execute(f"SELECT {probes} FROM ({sql})").fetchone()
        for i, c in enumerate(ts_cols):
            for v in vals[2 * i : 2 * i + 2]:
                if v is not None:
                    v = v.replace(tzinfo=None)
                    assert lo <= v <= hi, (
                        f"timestamp column {c!r} value {v} is outside the "
                        "pandas datetime64[ns] range; the driver will throw "
                        "OutOfBoundsDatetime — emit epoch-second longs or "
                        "an in-range sentinel"
                    )


def compare(spark_df, sql: str, sf_dir: str) -> None:
    con = duckdb_con(sf_dir)
    check_driver_compatible_types(con, sql)
    # Round-trip the oracle result through pandas exactly as the driver
    # does, so conversion failures (OutOfBoundsDatetime etc.) surface
    # locally; values are still compared from the native fetch below.
    con.execute(sql).df()
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    # Same for the Spark side: the driver calls toPandas(), which can
    # throw where collect() succeeds (pandas ns-range, round-5 e2).
    # Persist so the conversion check and the value fetch share one
    # execution of the plan.
    spark_df = spark_df.persist()
    try:
        spark_df.toPandas()
        s_rows = [tuple(r) for r in spark_df.collect()]
    finally:
        spark_df.unpersist()
    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    sc = _canon(s_rows, [c.lower() for c in s_cols])
    oc = _canon(o_rows, [c.lower() for c in o_cols])
    for i, (a, b) in enumerate(zip(sc, oc)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  oracle: {b}"
