from go_pq_cdc_kafka_spark.operators import dedup, relational, similarity  # noqa: F401
