"""Cross-engine verification of the NULL-text degrade conventions.

Several document operators document a "NULL text degrades, never
crashes" contract (0-token packing rows, 0-tag markup stats), but the
driver's testdata contains no NULL text, so the contract was never
exercised against the DuckDB oracles.  This suite builds an augmented
corpus — the real sf0.001 tables plus one NULL-text document — and runs
the flagged query/oracle pairs over it (round-7 ADVICE items 1–2)."""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tests.oracle import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def null_sf_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 with one extra NULL-text document (doc_id past the max,
    odd shard residues exercised by construction)."""
    import duckdb

    out = tmp_path_factory.mktemp("null_corpus")
    for name in os.listdir(sf_dir):
        if name == "documents.parquet":
            continue
        os.symlink(os.path.join(sf_dir, name), out / name)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{sf_dir}/documents.parquet'
          UNION ALL
          SELECT 100003, NULL, 'en', 'web', 0
        ) TO '{out / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    return str(out)


def test_p2_packing_null_text(spark, null_sf_dir):
    """pack ⊕ chunk ⊕ nostraddle all degrade NULL text to a 0-token
    row, and the oracles (COALESCE'd n) replay it exactly."""
    df = QUERIES["p2_packing_chunking"](spark, null_sf_dir)
    compare(df, ORACLES["p2_packing_chunking"], null_sf_dir)
    row = df.filter(
        (F.col("doc_id") == 100003) & (F.col("variant") == "nostraddle")
    ).collect()
    assert len(row) == 1 and row[0]["n_tokens"] == 0
    assert row[0]["payload"] == "false"  # 0-token doc is never oversize


def test_x6_html_null_text(spark, null_sf_dir):
    """html_markup_stats' documented (0 tags, 0 len, 0 ratio) degrade
    for NULL text matches the oracle's COALESCE'd replay."""
    df = QUERIES["x6_quality_gates"](spark, null_sf_dir).filter(
        F.col("variant") == "html"
    )
    sql = (
        f"SELECT * FROM ({ORACLES['x6_quality_gates']}) WHERE variant = 'html'"
    )
    compare(df, sql, null_sf_dir)
    row = df.filter(F.col("name").startswith("100003:")).collect()
    assert len(row) == 1
    assert row[0]["n"] == 0 and row[0]["total"] == 0 and row[0]["value"] == 0.0
