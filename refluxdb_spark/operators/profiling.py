"""Column profiling — the data-quality pass a pipeline runs over every
new table/partition before trusting it (null rates, cardinalities),
produced in ONE aggregation job.

The reference has no profiling surface (its schema introspection stops
at SHOW FIELD/TAG KEYS, persistence.rs:160-196); this is the §2.5
pipeline-operator extension of that idea: not just which columns
exist, but whether their contents look sane.

Scale: all statistics are map-side-combinable aggregates over a single
scan. Exact ``count_distinct`` over k columns makes Catalyst plan an
Expand (k× the mapper input) — fine for the oracle gate and modest k;
at 100 TB pass ``exact=False`` to use ``approx_count_distinct`` (HLL,
no Expand, one pass) — the same estimator the rollup sketches persist.
The long-format output (one row per column) comes from exploding a
struct array over the SINGLE aggregated row — no per-column jobs, no
driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation:
    (column, n_rows, n_nulls, null_fraction, n_distinct).

    ``exact=True`` → exact distinct counts (Expand-based, k× mapper
    input, cross-engine oracle-able). ``exact=False`` → HLL
    ``approx_count_distinct(rsd)``: single pass, no Expand — the
    100 TB default, estimator error ~rsd. null_fraction is one
    int/int division of exact counts — deterministic everywhere."""
    cols = cols or df.columns
    cd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd))
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_nul_{c}")
        )
        aggs.append(cd(c).cast("bigint").alias(f"_dis_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_nul_{c}").alias("n_nulls"),
                F.col(f"_dis_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.col("_rows").alias("n_rows"), F.explode(entries).alias("_e"))
        .select(
            F.col("_e.column").alias("column"),
            "n_rows",
            F.col("_e.n_nulls").alias("n_nulls"),
            (F.col("_e.n_nulls") / F.col("n_rows")).alias("null_fraction"),
            F.col("_e.n_distinct").alias("n_distinct"),
        )
    )
