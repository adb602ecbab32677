"""Canonical dtype families for cross-engine (Spark vs DuckDB) schema parity.

The driver's correctness hash is type-sensitive: a column whose values are
identical but whose physical type differs between the Spark result and the
DuckDB oracle (e.g. DuckDB's windowed ``SUM`` yielding HUGEINT/int128 where
Spark emits BIGINT) hash-mismatches. These helpers map both engines' types
onto one width-preserving vocabulary so tests can fence the skew before the
driver sees it (the ``sample_pack_bins`` r04 failure mode).
"""

from __future__ import annotations

_SPARK = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
    "boolean": "bool", "binary": "bin",
}

_DUCK = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "UBIGINT": "u64", "UINTEGER": "u32", "HUGEINT": "i128",
    "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "tstz", "DATE": "date",
    "BOOLEAN": "bool", "BLOB": "bin",
}


def canon_spark_type(dt) -> str:
    """Canonical dtype family for a Spark ``DataType``."""
    s = dt.simpleString()
    if s in _SPARK:
        return _SPARK[s]
    if s.startswith("decimal"):
        return s.replace(" ", "")
    return s


def canon_duck_type(t) -> str:
    """Canonical dtype family for a DuckDB column type object."""
    s = str(t)
    if s in _DUCK:
        return _DUCK[s]
    if s.startswith("DECIMAL"):
        return s.lower().replace(" ", "")
    return s.lower()
