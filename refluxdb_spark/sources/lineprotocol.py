"""Line-protocol parsing as Spark column expressions (the hot path).

The reference parses one datagram at a time in Rust (``protocol.rs:78-147``)
under a global mutex. Here the same grammar is implemented with built-in
``pyspark.sql.functions`` only — the whole parse stays inside WholeStage
codegen, no Python is invoked per row, and it applies identically to a
batch DataFrame or a Structured Streaming source.

Semantics (mirroring ``protocol.rs``, with the Q6 fix):
- whitespace-split into [measurement+tags, fieldset, timestamp],
- comma-split, ``=``-split pairs; empty keys/values skipped
  (``protocol.rs:34-44``),
- field values cast to double with ``try_cast`` — a non-numeric value or
  missing timestamp/fieldset marks the row with ``error`` (dead-letter)
  instead of panicking (reference panics: ``protocol.rs:42``, quirk Q6),
- multi-field lines explode to one row per field, the field key becoming
  column ``name`` (``handlers.rs:112-134``, ``udpserver.rs:33-49``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# "k=v,k2=v2" -> array<struct<key,value>> keeping only non-empty keys and
# values (protocol.rs:34-44 skips empties). Pairs lacking '=' get a null
# value and are filtered; `{col}` is substituted with the source column.
_PAIRS = (
    "filter(transform(split({col}, ','),"
    " p -> struct(substring_index(p, '=', 1) as key,"
    "             case when instr(p, '=') > 0 then substr(p, instr(p, '=') + 1) end as value)),"
    " s -> s.key != '' and s.value is not null and s.value != '')"
)


def parse_lines_df(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse a DataFrame of raw lines into LINE_SCHEMA columns.

    Input: any DataFrame with a string column ``line_col`` (e.g. from
    ``spark.read.text``, a socket stream, or ``createDataFrame``).
    Output columns: ``measurement, tags MAP<STRING,STRING>,
    fields MAP<STRING,DOUBLE>, ts LONG, error STRING, raw STRING``.

    Rows with ``error IS NOT NULL`` are dead-letter rows (empty line,
    missing fieldset/timestamp, non-numeric field value) — inputs on
    which the reference would have panicked or errored
    (``protocol.rs:79-81,125-127,142-144``, Q6).
    """
    c = F.col(line_col)
    tok = lines.select(
        c.alias("raw"),
        F.split(F.trim(c), r"\s+").alias("_tok"),
    ).select(
        "raw",
        F.element_at("_tok", 1).alias("_head"),
        F.when(F.size("_tok") >= 2, F.element_at("_tok", 2)).alias("_fieldtok"),
        F.when(F.size("_tok") >= 3, F.element_at("_tok", 3)).alias("_tstok"),
    )

    parsed = tok.select(
        "raw",
        F.substring_index("_head", ",", 1).alias("measurement"),
        F.map_from_entries(
            F.expr(_PAIRS.format(col="concat(',', substr(_head, length(substring_index(_head, ',', 1)) + 2))"))
        ).alias("tags"),
        F.expr(
            "map_from_entries(transform(" + _PAIRS.format(col="_fieldtok") + ","
            " s -> struct(s.key as key, try_cast(s.value as double) as value)))"
        ).alias("_fields_raw"),
        F.col("_tstok").try_cast("bigint").alias("ts"),
        "_tstok",
        "_fieldtok",
    )

    bad_field = F.expr("exists(map_values(_fields_raw), v -> v is null)")
    error = (
        F.when(F.col("measurement").isNull() | (F.col("measurement") == ""), "empty line")
        .when(
            F.col("_fieldtok").isNull() | (F.size(F.map_keys(F.col("_fields_raw"))) == 0),
            "missing fieldset",
        )
        .when(bad_field, "non-numeric field value")
        .when(F.col("_tstok").isNull(), "missing timestamp")
        .when(F.col("ts").isNull(), "bad timestamp")
    )

    return parsed.select(
        "measurement",
        "tags",
        F.expr("map_filter(_fields_raw, (k, v) -> v is not null)").alias("fields"),
        "ts",
        error.alias("error"),
        "raw",
    )


def explode_fields(parsed: DataFrame) -> DataFrame:
    """One stored row per field (field key -> column ``name``).

    Mirrors the reference's per-field fan-out loop
    (``handlers.rs:112-134``, ``udpserver.rs:33-49``) as a single
    distributed ``explode`` — no driver loop. Only clean rows
    (``error IS NULL``) are exploded; callers keep the DLQ separately.
    Output: ``series, tags, ts, name, value``.
    """
    return parsed.filter(F.col("error").isNull()).select(
        F.col("measurement").alias("series"),
        "tags",
        "ts",
        F.explode("fields").alias("name", "value"),
    )


def read_lineprotocol(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a text file of line-protocol lines into parsed rows."""
    return parse_lines_df(spark.read.text(path), "value")
