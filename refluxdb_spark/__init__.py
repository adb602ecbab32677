"""refluxdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gleicon/refluxdb.

The reference (``/root/reference``, Rust) is an InfluxDB-style time-series
store: line-protocol ingest (UDP/HTTP), one embedded sled+GlueSQL database
per timeseries, a SELECT-only SQL gateway, and a time-range endpoint.

This package re-expresses those semantics Spark-first:

- one partitioned lake table ``measurements`` instead of per-series
  databases (scales to 100 TB; partition pruning replaces the per-series
  registry routing of ``persistence.rs:198-200``),
- line-protocol parsing as built-in column expressions
  (``sources/lineprotocol.py``), not a row-at-a-time loop,
- the SQL gateway as validation + ``spark.sql`` over Catalyst
  (``gateway.py``), replacing GlueSQL,
- Structured Streaming ingest with event-time watermarks
  (``streaming/ingest.py``) replacing the mutex-serialized
  datagram-at-a-time write path (``udpserver.rs:34``),
- plus the large-scale pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) under ``operators/``.
"""

from refluxdb_spark.engine import RefluxEngine
from refluxdb_spark.session import get_spark

__all__ = ["RefluxEngine", "get_spark"]
__version__ = "0.1.0"
