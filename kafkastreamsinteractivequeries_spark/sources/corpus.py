"""Corpus readers/writers for the training-data operators: the
`documents` schema over parquet / JSONL / CSV / raw-text directories.

The extension operators only assume (doc_id, text, …) columns, so any
of these sources feeds dedup / text / curation unchanged.  Schemas are
always DECLARED (inference is a dev convenience that silently changes
types between runs — never in the pipeline path).

Scale notes: JSONL/CSV/text read with the same split-parallelism as
parquet but without column pruning or predicate pushdown — land raw
corpora into parquet early (``write_corpus``) and run everything
downstream against that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines corpus with the declared documents schema (missing
    fields become NULL; extra fields are dropped — no inference)."""
    return spark.read.schema(DOCUMENT_SCHEMA).json(path)


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV corpus with the declared schema (quoted/escaped text)."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )


def read_documents_text(
    spark: SparkSession, path: str, source: str = "text-dir"
) -> DataFrame:
    """Raw text files, one document per file: synthesizes the documents
    schema (doc_id = dense rank of file path — deterministic for a
    fixed file set; lang unknown → language_id fills it downstream)."""
    from pyspark.sql import Window

    files = spark.read.format("text").option("wholetext", "true").load(path)
    with_path = files.select(
        F.col("value").alias("text"),
        F.input_file_name().alias("_path"),
    )
    w = Window.orderBy("_path")
    # dense id via rank over path: acceptable for ingest-sized file
    # sets; at huge scale use monotonically_increasing_id + a remap
    return with_path.select(
        (F.row_number().over(w) - 1).cast("long").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def write_corpus(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Land a corpus as parquet (the format every downstream operator
    should read): sized output files via repartition, snappy parquet."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").parquet(path)
