"""SparkSession construction tuned for the engine.

Scale posture: these defaults are written for a real multi-executor cluster
(AQE on, skew-join handling, partition coalescing); tests run them on
``local[N]`` unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Dynamic SQL confs every entry point should ensure, even on a session we did
# not create (the correctness driver owns its own session).
RUNTIME_CONFS: dict[str, str] = {
    # the driver-generated events.parquet stores TIMESTAMP(NANOS) which the
    # vectorized parquet reader rejects; read as long and convert explicitly
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp semantics regardless of machine TZ
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: partition coalescing + skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the few pandas-UDF operators (similarity/multimodal)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # WITH RECURSIVE guard rail: the 1M-row default tripped at sf10, where
    # recursive_tree_rollup's ANCHOR alone is 1.5M customers (the walk is
    # provably n*log10(n) rows — depth = key digits — so a generous cap
    # keeps the runaway-recursion protection without failing legitimate
    # linear-ish closures; the 100-level depth default stays untouched)
    "spark.sql.cteRecursionRowLimit": "2000000000",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set dynamic confs on an existing session (driver-owned sessions too)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-dynamic conf on this build — keep going, defaults are sane
            pass
    return spark


def enable_runtime_bloom_filters(
    spark: SparkSession,
    application_side_threshold: str = "10GB",
    creation_side_threshold: str | None = None,
) -> SparkSession:
    """Turn on Spark's injected runtime Bloom filters for shuffle joins.

    When a shuffle join's build side carries a selective predicate, the
    optimizer aggregates a Bloom filter over the build-side join keys
    (``bloom_filter_agg``) and pushes a ``might_contain`` pre-filter into
    the probe-side scan — the probe side (e.g. a 100 TB corpus joining a
    benchmark suite for decontamination) drops non-matching rows map-side
    before shuffling anything. The sketch only prunes, never admits, so
    results are unchanged.

    ``application_side_threshold`` gates injection by probe-scan size; the
    10GB default means small local runs skip the sketch (right call — the
    filter costs one extra aggregation of the build side). Pass ``"0"`` to
    force it for plan inspection/tests. Two injection constraints worth
    knowing: an explicit ``merge``/``shuffle_hash`` join hint suppresses
    injection on that join (leave strategy to the optimizer where runtime
    filtering matters), and the probe-side join key must be a plain scan
    column — computed keys (e.g. exploded shingles) don't qualify, so
    sketch-prefilter those joins by reducing with a broadcast semi-join
    instead.

    ``creation_side_threshold`` raises the BUILD-side size gate
    (``creationSideThreshold``, Spark default 10MB): past roughly sf1 a
    selectively-filtered dimension's estimate exceeds 10MB and Spark
    silently declines to build the sketch — the round-5 sf1 scale step
    caught exactly that flip. Size it to what one executor can afford to
    aggregate (the sketch is numBits/8 bytes, not build-side bytes).
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_threshold,
    )
    if creation_side_threshold is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            creation_side_threshold,
        )
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable in Spark's Python workers regardless of
    the driver's cwd (Python DataSources and UDFs referencing package code
    are unpickled worker-side by module path). Zips the package once per
    session and ships it with ``addPyFile`` — the same mechanism used to ship
    deps to a real cluster's executors."""
    if getattr(spark, "_gpck_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"go_pq_cdc_kafka_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._gpck_shipped = True


def _ensure_protobuf_path() -> None:
    """transformWithStateInPandas needs ``google.protobuf`` in the Python
    WORKERS (they parse the state-server protocol). When the real package
    is absent, append the vendored from-scratch shim
    (vendor/google/protobuf — proto3 wire subset, see its module doc) to
    sys.path AND PYTHONPATH — the latter before the JVM starts, so worker
    processes it spawns inherit it. The real package always wins: the
    vendor dir is only added when the import fails."""
    import sys as _sys

    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor")
    try:
        import google.protobuf as _gp

        # only a REAL installation short-circuits: if the import resolved
        # to this very shim (someone put vendor on sys.path earlier in
        # the process), PYTHONPATH must still be exported for the worker
        # processes the JVM will spawn
        if not (getattr(_gp, "__file__", "") or "").startswith(vendor):
            return
    except ImportError:
        pass
    if vendor not in _sys.path:
        _sys.path.append(vendor)
    existing = os.environ.get("PYTHONPATH", "")
    if vendor not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            existing + (os.pathsep if existing else "") + vendor
        )


def get_spark(
    app_name: str = "go-pq-cdc-kafka-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[N]`` with N = ``SPARK_GRAFT_CPUS`` or all
    cores — on a real cluster, leave it unset and submit with your cluster
    manager; nothing here assumes local mode.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Python workers (UDFs, Python DataSource planner) are spawned by the JVM
    # and import this package by module path — make it importable for them
    # regardless of cwd. Must happen before the JVM starts.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )
    _ensure_protobuf_path()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = {
        **RUNTIME_CONFS,
        # one shuffle partition per core locally; on a cluster AQE coalesces
        # from this initial value, so a generous default is safe.
        # SPARK_GRAFT_SHUFFLE_PARTITIONS raises the initial count for
        # big-SF runs: shuffle-partition count is spill GEOMETRY — at
        # sf100 a 50 GB shuffle over 32 partitions is a 1.5 GB sort per
        # task (guaranteed multi-pass spill), over 192 it is ~260 MB
        # (mostly in-memory). AQE coalesces small stages back down, so
        # the higher initial value costs small queries nothing — the
        # same reasoning as a real cluster's default of 200+.
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
            or cpus
        ),
        "spark.sql.files.maxPartitionBytes": "128m",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # AQE's runtime broadcast-conversion threshold compares COMPRESSED
        # shuffle bytes, but the driver must build the UNCOMPRESSED in-JVM
        # hash relation — ~10x larger for string-keyed relations. Sizing
        # rule: threshold x expansion x concurrent-builds must fit in the
        # driver/executor memory headroom, so this stays well below the
        # static threshold above (static estimates are conservative
        # OVER-estimates; runtime compressed sizes are under-estimates of
        # build cost). The round-6 sf10 step caught AQE converting the
        # MinHash banded self-join (2M rows, <64 MB compressed) into a
        # broadcast whose ~0.5 GB hash relation OOMed the 8 GB driver; at
        # 8 MB the conversion still fires for genuinely small runtime
        # sides (keeps small-SF latency) but can never ask for a build
        # beyond ~80 MB in-memory.
        "spark.sql.adaptive.autoBroadcastJoinThreshold": str(8 * 1024 * 1024),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
