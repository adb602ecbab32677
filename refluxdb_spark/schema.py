"""Schemas for the engine's core tables.

The reference creates every per-series table with one fixed DDL
(``utils/db.rs:74-77``)::

    CREATE TABLE <ts> (id UUID, time TIMESTAMP, created_at TIMESTAMP,
                       name TEXT, value FLOAT, tags MAP);

We collapse per-series databases into ONE partitioned lake table and add
the ``series`` column (SURVEY §1.5). Type mapping:

- UUID        -> StringType (Spark has no UUID type; ``uuid()`` generates)
- FLOAT (f64) -> DoubleType (Spark FloatType is 32-bit — wrong width)
- MAP         -> MapType(String, String) (native; the reference stores a
                 JSON string in a GlueSQL MAP and loses it on read, Q7)

``time`` is EVENT time (the client's line-protocol timestamp); the
reference discards it and stamps server time (quirk Q1,
``persistence.rs:111-120``) — we store both, with ``created_at`` the
arrival time, and a compat flag in the engine reproduces Q1 if wanted.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One parsed line-protocol record, before field explosion.
# Reference wire struct: protocol.rs:4-10 (measurement_name, tag_set,
# field_set: IndexMap<String, f64>, timestamp: i64 — ns in examples).
LINE_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("fields", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("ts", T.LongType(), True),  # client epoch (ns)
        T.StructField("error", T.StringType(), True),  # non-null => DLQ row
        T.StructField("raw", T.StringType(), True),  # original line (DLQ)
    ]
)

# The core lake table. Partition columns: series, day (derived date(time)).
MEASUREMENTS_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("time", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Columns in reference decoder order (utils/db.rs:33-49 expects this
# positional shape; our strict-compat projection check uses it).
MEASUREMENT_COLUMNS = ["id", "time", "created_at", "name", "value", "tags"]
