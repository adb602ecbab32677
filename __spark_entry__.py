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
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from refluxdb_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-series hourly
    rollup (the reference's unbuilt pre-calculated-stats TODO,
    persistence.rs:40, as a Spark windowed aggregation)."""
    return QUERIES["ts_time_bucket_rollup"](spark, "/root/testdata/sf0.001")


def _coverage_order(names: list[str]) -> list[str]:
    """Order query names for driver sampling (the driver records the
    FIRST 50): (1) checked but whose most recent row is not a pass
    (errors or mismatches — must re-verify first), (2) never
    driver-checked (ZERO driver evidence — only the local oracle
    mirror has ever seen them, so they outrank everything green; the
    r7 verdict showed the old stale-green-first ordering starves this
    set forever because the stale cohort regenerates at exactly the
    sampling rate), (3) green but whose last pass is ≥2 rounds old,
    stalest first (old driver evidence PLUS current local-mirror
    green — strictly stronger than category 2), (4) green within the
    last two rounds, stalest first. Stable within ties."""
    last_round: dict[str, int] = {}
    last_pass: dict[str, int] = {}
    here = os.path.dirname(__file__)
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, r in rows.items():
            last_round[name] = max(last_round.get(name, -1), rnd)
            if isinstance(r, dict) and r.get("hash_match"):
                last_pass[name] = max(last_pass.get(name, -1), rnd)

    max_round = max(last_round.values(), default=0)

    def key(n: str):
        if n not in last_round:
            return (1, 0, names.index(n))  # never driver-checked
        lp = last_pass.get(n, -1)
        if lp < last_round[n]:
            return (0, 0, names.index(n))  # latest row is red
        if lp <= max_round - 2:
            return (2, lp, names.index(n))  # stale green backlog
        return (3, lp, names.index(n))  # recently green

    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _coverage_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _coverage_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
