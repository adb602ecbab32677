"""Skew mitigation: salted joins and heavy-hitter detection.

AQE's skew-join split (enabled in session.py) handles most runtime
skew, but it only kicks in for sort-merge joins after a shuffle has
materialized; salting is the planning-time tool when a hot key is
known or must be handled deterministically (e.g. a boilerplate
document hash owning 1% of a 100 TB corpus).

The salt is derived from row content (xxhash64), not RNG — results are
reproducible run-to-run, which random salting is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_input(
    df: DataFrame, key_col: str, min_tasks: int | None = None
) -> DataFrame:
    """Fan a narrow scan out across the cluster BEFORE per-row-expensive
    work — the guide §2.5 "input skew: one huge unsplittable file →
    repartition immediately after the read" case.

    A parquet file splits only at row-group boundaries, so a small or
    single-row-group input scans as ONE task and every pre-exchange
    expression chained onto the scan (tokenize + gram explode,
    per-replicate md5 draws, feature hashing) runs serially no matter
    how many cores the session has — sample_bootstrap_ci measured
    5.6 s wall on 5.0 s CPU at sf0.1/local[32]: a serial stage on a
    32-core box. When the scan's planned parallelism is below the
    session's default parallelism, hash-repartition on ``key_col``
    (deterministic under retry, unlike a rand()-derived key — guide
    §2.5; round-robin would pay a defensive local sort) so the heavy
    expressions run on every core. When the input already has at least
    that many partitions — any real multi-file table, 100 TB included —
    this adds NOTHING (no exchange). The shuffled bytes are the narrow
    input relation itself, paid once, before any fan-out multiplies
    row counts.

    Callers must be layout-invariant (true of every operator in this
    repo — md5-keyed determinism is the module-wide discipline), since
    a repartition changes partition contents and order."""
    sc = df.sparkSession.sparkContext
    target = min_tasks or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key_col))


def heavy_hitters(df: DataFrame, key_cols: list[str], min_count: int) -> DataFrame:
    """Keys whose row count >= min_count — the skew report used to
    decide salting/bucket caps. One aggregation, map-side combined."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the left side's hot keys spread over ``salt``
    sub-keys and the right side replicated ``salt`` times.

    Left rows get a deterministic content-derived salt; right rows are
    exploded across every salt value. The join key becomes
    (on..., _salt), so one hot key now lands on ``salt`` reducers
    instead of one. Right-side replication costs salt x |right| — use
    when |right| is too big to broadcast but small enough to replicate
    (the classic mid-size-dimension skew case).

    Result equals ``left.join(right, on, how)`` for 'inner' and 'left'.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on=[*on, "_salt"], how=how).drop("_salt")
