from go_pq_cdc_kafka_spark.functions import multimodal, text  # noqa: F401
