from go_pq_cdc_kafka_spark.streaming.kafka import (  # noqa: F401
    Compression,
    KafkaProducerConfig,
    parse_size,
)
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline  # noqa: F401
