"""Durable parquet sinks for Structured Streaming ``foreachBatch``.

The memory-sink wrappers in ``streaming.ingest`` are test harnesses —
results land in driver memory. These two primitives are the production
shapes: plain parquet paths (no extra table format required) with
exactly-once semantics built from the two idempotency tricks a lake
sink actually has:

- ``idempotent_append_sink``: append streams (dedup output, parsed
  ingest). Each micro-batch writes under its own ``_batch_id=<n>``
  partition with DYNAMIC partition overwrite — a retried batch
  overwrites its own partition instead of appending twice, so
  at-least-once foreachBatch delivery becomes exactly-once on disk.
- ``upsert_sink``: update-mode aggregation streams (windowed rollups).
  Each changed (key) row overwrites exactly its own ``_upsert_key``
  partition (md5 of the key columns), so the table always holds the
  LATEST value per key — MERGE semantics on plain parquet. Windows
  still inside the watermark horizon are therefore visible and keep
  refining, and the final state equals the batch aggregation.

Scale notes: one directory per batch / per key is metadata-heavy on
object stores at extreme cardinality; at that point swap the same
foreachBatch body for a Delta/Iceberg MERGE — the streaming side is
unchanged. Readers list the sink with ``read_*`` helpers that drop the
bookkeeping columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator: cannot appear in normal key values


def idempotent_append_sink(path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch body giving exactly-once APPEND onto plain parquet:
    batch N's rows live under ``_batch_id=N``; a replayed batch
    dynamically overwrites only that partition."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return _write


def upsert_sink(path: str, key_cols: list[str]) -> Callable[[DataFrame, int], None]:
    """foreachBatch body giving MERGE-by-key onto plain parquet: each
    row's partition is the md5 of its key columns, and dynamic
    overwrite replaces exactly the partitions present in the batch —
    update-mode aggregation output lands as latest-value-per-key."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.withColumn(
            "_upsert_key",
            F.md5(
                F.concat_ws(
                    _SEP, *[F.col(c).cast("string") for c in key_cols]
                )
            ),
        )
        (
            keyed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_upsert_key")
            .parquet(path)
        )

    return _write


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink path back, dropping the idempotency bookkeeping."""
    df = spark.read.parquet(path)
    return df.drop("_batch_id", "_upsert_key")
