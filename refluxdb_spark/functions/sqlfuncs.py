"""SQL-visible TSDB helper functions (Spark SQL-defined functions).

Registered as TEMPORARY FUNCTIONs (pure SQL expression bodies — they
inline into Catalyst plans and stay inside codegen; these are NOT
Python UDFs). Users of the gateway (``POST /query``) can call them
directly, giving the reference's SQL surface the time-series verbs
GlueSQL 0.9 never had.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS: dict[str, str] = {
    # time_bucket_s(ts, 900) -> start of the 900-second bucket
    "time_bucket_s": (
        "(t TIMESTAMP, width_s BIGINT) RETURNS TIMESTAMP RETURN "
        "timestamp_micros(unix_micros(t) - unix_micros(t) % (width_s * 1000000))"
    ),
    # rate(dv, dus) -> per-second rate from a value delta + microsecond gap
    "rate_per_second": (
        "(dv DOUBLE, dus BIGINT) RETURNS DOUBLE RETURN "
        "CASE WHEN dus > 0 THEN dv / (dus / 1000000.0) END"
    ),
    # clamp a value into [lo, hi]
    "clamp": (
        "(x DOUBLE, lo DOUBLE, hi DOUBLE) RETURNS DOUBLE RETURN "
        "least(greatest(x, lo), hi)"
    ),
    # age of an event vs its ingest time (Q1: both timestamps exist here)
    "ingest_lag_ms": (
        "(event_time TIMESTAMP, arrival_time TIMESTAMP) RETURNS BIGINT RETURN "
        "(unix_micros(arrival_time) - unix_micros(event_time)) div 1000"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the TSDB SQL function library on this session; returns
    the registered names. Safe to call repeatedly (OR REPLACE)."""
    for name, body in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(_FUNCTIONS)
