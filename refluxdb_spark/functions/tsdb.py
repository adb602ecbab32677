"""TSDB-style analytic functions (PromQL-shaped: rate / delta /
arbitrary-width binning) as pure column/DataFrame builders.

These are the monitoring-query primitives the reference's data model
implies but GlueSQL 0.9 cannot express (SURVEY §2.2: no window
functions, no date arithmetic surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def date_bin(ts_col: str | Column, width_seconds: int) -> Column:
    """Arbitrary-width time bucket via exact epoch-microsecond integer
    arithmetic (works for widths F.window can't cheaply express, and
    is reproducible in any engine: floor-div then scale back)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    width_us = width_seconds * 1_000_000
    return F.timestamp_micros(
        (F.unix_micros(c) - F.unix_micros(c) % width_us).cast("long")
    )


def delta_per_series(
    df: DataFrame,
    ts_col: str,
    by: list[str],
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """value - lag(value) per series in time order (PromQL ``delta``
    building block). One shuffle on the series key."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*by).orderBy(*order)
    return df.withColumn("delta", F.col(value_col) - F.lag(value_col).over(w))


def rate_per_series(
    df: DataFrame,
    ts_col: str,
    by: list[str],
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-series per-bucket rate: (last - first) / (t_last - t_first)
    within each time bucket — the counter-rate estimator (PromQL
    ``rate`` without extrapolation). Buckets with one sample yield
    NULL. One shuffle (groupBy series+bucket); first/last are resolved
    with deterministic min/max over (time, value) structs, so ties on
    identical timestamps break by value, reproducibly.

    Division is double/double of identical operands -> engine-portable.
    """
    b = date_bin(ts_col, bucket_seconds).alias("bucket")
    us = F.unix_micros(F.col(ts_col))
    pair = F.struct(us.alias("us"), F.col(value_col).alias("v"))
    agged = df.groupBy(*by, b).agg(
        F.min(pair).alias("_first"),
        F.max(pair).alias("_last"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    span_us = F.col("_last.us") - F.col("_first.us")
    rate = F.when(
        span_us > 0,
        (F.col("_last.v") - F.col("_first.v")) / (span_us / F.lit(1_000_000.0)),
    )
    return agged.select(
        *by,
        "bucket",
        "n_samples",
        F.col("_first.v").alias("first_value"),
        F.col("_last.v").alias("last_value"),
        rate.alias("rate_per_sec"),
    )
