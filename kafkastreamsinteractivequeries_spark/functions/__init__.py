from kafkastreamsinteractivequeries_spark.functions.predicate import compile_predicate

__all__ = ["compile_predicate"]
