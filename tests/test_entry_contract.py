"""Driver-contract fences: __spark_entry__ exposes consistent queries
and oracles, and column names agree between the Spark result and the
DuckDB oracle (the driver's compare sorts columns by name — a name
mismatch fails the hash even when values are identical)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from refluxdb_spark.oracle_types import canon_duck_type, canon_spark_type
from refluxdb_spark.queries import ORACLES, QUERIES, TABLES


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    assert entry_mod.queries().keys() == QUERIES.keys()
    assert entry_mod.oracle_sql().keys() == ORACLES.keys()


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_column_names_match_oracle(spark, sf_dir, name):
    """Names AND canonical dtypes must agree: the driver hash is
    type-sensitive (DuckDB HUGEINT vs Spark BIGINT mismatched
    ``sample_pack_bins`` in r04 with identical values)."""
    if name.startswith("ts_streaming"):
        pytest.skip("streaming entries execute fully; covered by check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sdf = QUERIES[name](spark, sf_dir)
    rel = con.sql(ORACLES[name])
    spark_types = {f.name.lower(): canon_spark_type(f.dataType)
                   for f in sdf.schema.fields}
    duck_types = {c.lower(): canon_duck_type(t)
                  for c, t in zip(rel.columns, rel.types)}
    assert sorted(spark_types) == sorted(duck_types)
    skew = {c: (spark_types[c], duck_types[c])
            for c in spark_types if spark_types[c] != duck_types[c]}
    assert not skew, f"dtype skew (spark, duck): {skew}"
