from go_pq_cdc_kafka_spark.plans.routing import (  # noqa: F401
    RoutingTable,
    resolve_topics,
)
