from go_pq_cdc_kafka_spark.sources.changelog import (  # noqa: F401
    generate_table_changelog,
    read_changelog,
    read_changelog_stream,
    write_changelog,
)
from go_pq_cdc_kafka_spark.sources.snapshot import (  # noqa: F401
    SnapshotConfig,
    snapshot_df_over_wire,
    snapshot_from_jdbc,
    snapshot_from_parquet,
)
from go_pq_cdc_kafka_spark.sources.wire import (  # noqa: F401
    ReplicationConnection,
    frame_source_from_dsn,
    parse_dsn,
)
