"""Bucketed-table materialization for shuffle-free co-located joins.

At 100 TB the dominant join cost is shuffling the fact table; bucketing
both sides of a recurring join on the join key (same bucket count)
lets Spark plan a SortMergeJoin with NO exchange on either side. This
is the lake-table equivalent of co-partitioned storage — the "pros:
isolation, parallelism" the reference claimed for per-series databases
(README.md:41), actually realized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed managed table (overwrite). Sorting by
    the join key within buckets removes the join-time sort as well."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously bucketed on ``on`` with equal bucket
    counts — plans without a shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
