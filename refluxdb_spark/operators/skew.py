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
