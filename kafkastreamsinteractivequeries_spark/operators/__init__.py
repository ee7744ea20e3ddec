from kafkastreamsinteractivequeries_spark.operators.aggregation import aggregate_transactions

__all__ = ["aggregate_transactions"]
