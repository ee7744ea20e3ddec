from kafkastreamsinteractivequeries_spark.plans.queries import (
    KeyQuery,
    MultiKeyQuery,
    RangeQuery,
    FilteredRangeQuery,
    FilteredWindowRangeQuery,
    QueryResponse,
    create_range_query,
)
from kafkastreamsinteractivequeries_spark.plans.service import InteractiveQueryService

__all__ = [
    "KeyQuery",
    "MultiKeyQuery",
    "RangeQuery",
    "FilteredRangeQuery",
    "FilteredWindowRangeQuery",
    "QueryResponse",
    "create_range_query",
    "InteractiveQueryService",
]
