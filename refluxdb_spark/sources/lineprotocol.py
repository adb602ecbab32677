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


# ===================================================================
# Typed field values — the reference's DECLARED but unbuilt surface
# (``README.md:49`` "value -> float (to be float, int, string and
# bool)"; its own unit tests use quoted string field values the f64-
# only parser cannot ingest, ``protocol.rs:155,164,173,183``).
# Wire forms: ``42i`` int64, ``t/T/true/True/TRUE`` (+f-variants)
# bool, ``"quoted"`` strings with ``\"``/``\\`` escapes (quoted
# values may contain spaces and commas), bare numerics float.
# Same implementation strategy as the untyped path: pure column
# expressions, no Python per row; the pure-Python twin is
# ``protocol.LineProtocol.parse(line, typed=True)`` and an
# equivalence corpus pins the two together.
# ===================================================================

# Anchored line grammar: head (no whitespace), fieldset (runs of
# non-space-non-quote chars and/or complete quoted strings — quoted
# segments may span spaces), timestamp. Anchoring makes trailing
# garbage a parse error (the untyped tokenizer ignored tokens past
# the third; the typed grammar is deliberately stricter).
_TYPED_LINE_RE = r'^\s*(\S+)\s+((?:"(?:[^"\\]|\\.)*"|[^\s"])+)\s+(\S+)\s*$'

# One fieldset pair: key (no '=', ',', '"') '=' value (complete quoted
# string, or bare run without ',' or '"'). Group 1 is the pair without
# its leading comma; array_join(pairs, ',') == fieldset certifies the
# matches TILE the fieldset exactly — any unmatched residue (stray
# quote, bare segment without '=', quote mid-value) breaks the
# reconstruction and the row dead-letters as 'bad fieldset'.
_TYPED_PAIR_RE = r'(?:^|,)([^=,"]+=(?:"(?:[^"\\]|\\.)*"|[^,"]*))'

#: entry struct produced per fieldset pair (before error filtering)
TYPED_FIELD_COLS = ["name", "value_type", "value", "value_int", "value_bool", "value_str"]


def _typed_entry(pair: F.Column) -> F.Column:
    """pair "k=rawv" -> struct(key, vtype, vf, vi, vb, vs, rawv).
    vtype NULL (or int with NULL vi: i64 overflow) marks an invalid
    value; the caller turns any such entry into a dead-letter row."""
    key = F.substring_index(pair, "=", 1)
    rawv = pair.substr(F.length(key) + F.lit(2), F.length(pair))
    is_string = rawv.rlike(r'^"(?:[^"\\]|\\.)*"$')
    is_int = rawv.rlike(r"^-?[0-9]+i$")
    is_true = rawv.isin("t", "T", "true", "True", "TRUE")
    is_false = rawv.isin("f", "F", "false", "False", "FALSE")
    vf = rawv.try_cast("double")
    vtype = (
        F.when(is_string, F.lit("string"))
        # any stray quote outside a complete quoted literal is invalid —
        # it must not fall through to the float cast
        .when(F.instr(rawv, '"') > 0, F.lit(None).cast("string"))
        .when(is_int, F.lit("int"))
        .when(is_true | is_false, F.lit("bool"))
        .when(vf.isNotNull(), F.lit("float"))
    )
    return F.struct(
        key.alias("key"),
        vtype.alias("vtype"),
        F.when(vtype == "float", vf).alias("vf"),
        F.when(
            is_int, rawv.substr(F.lit(1), F.length(rawv) - F.lit(1)).try_cast("bigint")
        ).alias("vi"),
        F.when(is_true, F.lit(True)).when(is_false, F.lit(False)).alias("vb"),
        F.when(
            is_string,
            F.regexp_replace(
                rawv.substr(F.lit(2), F.length(rawv) - F.lit(2)), r"\\(.)", r"$1"
            ),
        ).alias("vs"),
        rawv.alias("rawv"),
    )


def parse_lines_typed_df(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Typed twin of :func:`parse_lines_df`: same whole-stage-codegen
    strategy, full int/bool/string/float value surface.

    Output columns: ``measurement, tags MAP<STRING,STRING>,
    fields ARRAY<STRUCT<key, vtype, vf, vi, vb, vs>>, ts LONG,
    error STRING, raw STRING``. ``fields`` is an array (not a map) so
    a duplicate field key within one line cannot abort the batch the
    way ``map_from_entries``'s dedup-policy exception would; the spec
    parser's dict keeps the last occurrence, and ``dict()`` over the
    array agrees."""
    c = F.col(line_col)
    tok = lines.select(
        c.alias("raw"),
        F.regexp_extract(c, _TYPED_LINE_RE, 1).alias("_head"),
        F.regexp_extract(c, _TYPED_LINE_RE, 2).alias("_fieldtok"),
        F.regexp_extract(c, _TYPED_LINE_RE, 3).alias("_tstok"),
    )

    pairs = F.regexp_extract_all(F.col("_fieldtok"), F.lit(_TYPED_PAIR_RE), 1)
    entries = F.filter(
        F.transform(pairs, _typed_entry),
        # protocol.rs:34-44 — empty values skipped (keys can't be empty:
        # the pair regex requires >= 1 key char)
        lambda s: s["rawv"] != "",
    )
    parsed = tok.select(
        "raw",
        "_head",
        "_tstok",
        "_fieldtok",
        F.substring_index("_head", ",", 1).alias("measurement"),
        F.map_from_entries(
            F.expr(
                _PAIRS.format(
                    col="concat(',', substr(_head, length(substring_index(_head, ',', 1)) + 2))"
                )
            )
        ).alias("tags"),
        F.array_join(pairs, ",").alias("_joined"),
        entries.alias("_entries"),
        F.col("_tstok").try_cast("bigint").alias("ts"),
    )

    bad_entry = F.exists(
        F.col("_entries"),
        lambda s: s["vtype"].isNull()
        | ((s["vtype"] == "int") & s["vi"].isNull()),
    )
    # diagnosis for lines the anchored grammar rejects: a quote-unaware
    # token count names the most likely cause (the spec parser's
    # message may differ on pathological quoting — both sides still
    # dead-letter, which is the contract the equivalence corpus pins)
    ntok = F.size(F.split(F.trim("raw"), r"\s+"))
    error = (
        F.when(F.trim("raw") == "", "empty line")
        .when(
            F.col("_head") == "",  # anchored grammar did not match
            F.when(ntok <= 1, "missing fieldset")
            .when(ntok == 2, "missing timestamp")
            .when(ntok >= 4, "trailing garbage after timestamp")
            .otherwise("bad fieldset"),
        )
        .when(F.instr("_head", '"') > 0, "quote in measurement/tag section")
        .when(F.col("measurement") == "", "empty measurement name")
        .when(F.col("_joined") != F.col("_fieldtok"), "bad fieldset")
        .when(F.size("_entries") == 0, "missing fieldset")
        .when(bad_entry, "bad field value")
        .when(F.col("ts").isNull(), "bad timestamp")
    )

    return parsed.select(
        "measurement",
        "tags",
        F.transform(
            "_entries",
            lambda s: F.struct(
                s["key"].alias("key"),
                s["vtype"].alias("vtype"),
                s["vf"].alias("vf"),
                s["vi"].alias("vi"),
                s["vb"].alias("vb"),
                s["vs"].alias("vs"),
            ),
        ).alias("fields"),
        "ts",
        error.alias("error"),
        "raw",
    )


def explode_typed_fields(parsed: DataFrame) -> DataFrame:
    """One stored row per typed field — the typed twin of
    :func:`explode_fields`. Output: ``series, tags, ts, name,
    value_type, value, value_int, value_bool, value_str``.

    ``value`` carries the numeric view for BOTH numeric types (the
    int cast to double) so every existing float aggregate works
    unchanged on a typed table; bool/string rows have NULL ``value``
    and carry their payload in the typed column."""
    return (
        parsed.filter(F.col("error").isNull())
        .select(
            F.col("measurement").alias("series"),
            "tags",
            "ts",
            F.explode("fields").alias("_f"),
        )
        .select(
            "series",
            "tags",
            "ts",
            F.col("_f.key").alias("name"),
            F.col("_f.vtype").alias("value_type"),
            F.coalesce(F.col("_f.vf"), F.col("_f.vi").cast("double")).alias("value"),
            F.col("_f.vi").alias("value_int"),
            F.col("_f.vb").alias("value_bool"),
            F.col("_f.vs").alias("value_str"),
        )
    )
