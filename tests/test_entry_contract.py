"""Driver-contract fences: __spark_entry__ exposes consistent queries
and oracles, and column names agree between the Spark result and the
DuckDB oracle (the driver's compare sorts columns by name — a name
mismatch fails the hash even when values are identical)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
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
    if name.startswith("ts_streaming"):
        pytest.skip("streaming entries execute fully; covered by check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark_cols = sorted(c.lower() for c in QUERIES[name](spark, sf_dir).columns)
    duck_cols = sorted(c.lower() for c in con.sql(ORACLES[name]).columns)
    assert spark_cols == duck_cols
