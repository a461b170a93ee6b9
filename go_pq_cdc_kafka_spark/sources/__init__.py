from go_pq_cdc_kafka_spark.sources.changelog import (  # noqa: F401
    generate_table_changelog,
    read_changelog,
    read_changelog_stream,
    write_changelog,
)
from go_pq_cdc_kafka_spark.sources.snapshot import (  # noqa: F401
    SnapshotConfig,
    snapshot_from_jdbc,
    snapshot_from_parquet,
)
