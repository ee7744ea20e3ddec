"""PySpark-native analytics engine with the query and data-processing
capabilities of ``bbejeck/KafkaStreamsInteractiveQueries``.

The reference (see ``/root/reference``, surveyed in ``SURVEY.md``) is a
Kafka Streams app that continuously aggregates stock transactions per
symbol into a queryable state store and serves interactive queries
(key / multi-key / range / filtered-range) over it.  This package
re-expresses that surface Spark-first:

- the continuous aggregate is a DataFrame aggregation
  (``operators.aggregation``), runnable in batch or Structured Streaming;
- the interactive-query surface is a set of declarative query objects
  (``plans.queries``) that compile to Catalyst ``Column`` predicates —
  partition pruning / predicate pushdown / scatter-gather are all
  Catalyst built-ins, so no custom routing layer exists;
- the JsonPath predicate mini-language of the reference's
  ``FilteredRangeQuery`` is compiled to Column expressions
  (``functions.predicate``);
- beyond the reference's surface, large-scale training-data-pipeline
  operators live in ``operators``: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  and multimodal-column plumbing.
"""

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.plans.queries import (
    KeyQuery,
    MultiKeyQuery,
    RangeQuery,
    FilteredRangeQuery,
    FilteredWindowRangeQuery,
    QueryResponse,
)
from kafkastreamsinteractivequeries_spark.plans.service import InteractiveQueryService
from kafkastreamsinteractivequeries_spark.functions.predicate import compile_predicate

__all__ = [
    "get_spark",
    "KeyQuery",
    "MultiKeyQuery",
    "RangeQuery",
    "FilteredRangeQuery",
    "FilteredWindowRangeQuery",
    "QueryResponse",
    "InteractiveQueryService",
    "compile_predicate",
]
