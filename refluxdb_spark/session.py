"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]``; the config here is chosen so the same
code is correct on a 1000-executor cluster: AQE on (runtime coalescing,
skew-join splitting), explicit shuffle partitioning, UTC session time
(so timestamp semantics match the ANSI/duckdb oracle), Arrow enabled for
the few pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "refluxdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller leaves it unset and spark-submit decides.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Rule of thumb: ~2-3x cores locally. On a cluster this would be
        # sized to data volume (target 128-256 MB per shuffle partition);
        # AQE coalesces down from this at runtime either way.
        shuffle_partitions = max(int(cpus) * 2, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Spark's INT96 timestamp default writes NO column statistics,
        # silently voiding the time-sorted-files page-skip design
        # (SCALE.md §1; fenced by
        # test_measurements_files_time_sorted_with_stats). MICROS
        # timestamps carry real min/max so range scans skip row groups.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # don't truncate PushedFilters/ReadSchema in explain output —
        # plan tests assert on them
        .config("spark.sql.maxMetadataStringLength", "2000")
        .config("spark.sql.legacy.createHiveTableByDefault", "false")
        # testdata events.parquet carries TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as BIGINT nanos and convert
        # explicitly (queries.load) — exact integer arithmetic, no
        # double round-trip.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming state store: RocksDB (rocksdbjni ships with Spark),
        # not the default HDFSBackedStateStoreProvider, which keeps
        # EVERY key's state deserialized in executor HEAP — at real
        # series/sender cardinality (millions of keys across the
        # applyInPandasWithState family, streaming/stateful.py) heap-
        # resident state is the first streaming OOM (VERDICT r17 item
        # 1). RocksDB keeps state on local disk with a bounded block
        # cache, so per-executor memory is O(cache), not O(keys).
        # Override via $SPARK_GRAFT_STATE_STORE (set it to
        # "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        # to get the old behavior); fenced by
        # test_state_store_provider_is_rocksdb.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            os.environ.get(
                "SPARK_GRAFT_STATE_STORE",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            ),
        )
        # Changelog checkpointing: upload per-batch deltas instead of
        # full RocksDB snapshots — checkpoint cost scales with CHANGED
        # keys per batch, not total state size (the right default once
        # state no longer fits heap).
        .config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
