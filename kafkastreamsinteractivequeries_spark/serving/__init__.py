from kafkastreamsinteractivequeries_spark.serving.rest import create_app

__all__ = ["create_app"]
