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


def test_coverage_order_never_checked_outranks_stale_green(tmp_path, monkeypatch):
    """Pin the sampling priority the r7 verdict mandated: red > never
    driver-checked > stale green > recent green. The old ordering put
    stale-green ahead of never-checked, which provably starves the
    never-set forever (the stale cohort regenerates at exactly the
    50-row/round sampling rate)."""
    import json

    rows_r1 = {
        "red_q": {"hash_match": True},
        "stale_q": {"hash_match": True},
        "recent_q": {"hash_match": True},
    }
    rows_r3 = {
        "red_q": {"hash_match": False, "err": "boom"},
        "recent_q": {"hash_match": True},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows_r1))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(rows_r3))
    monkeypatch.setattr(entry_mod.os.path, "dirname", lambda _: str(tmp_path))

    order = entry_mod._coverage_order(
        ["recent_q", "stale_q", "never_q", "red_q"]
    )
    assert order == ["red_q", "never_q", "stale_q", "recent_q"]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_column_names_match_oracle(spark, sf_dir, name):
    """Names AND canonical dtypes must agree: the driver hash is
    type-sensitive (DuckDB HUGEINT vs Spark BIGINT mismatched
    ``sample_pack_bins`` in r04 with identical values)."""
    # streaming entries were skipped here through r17 ("execute fully")
    # — but the guard was cost, not semantics, and the suite already
    # boots stateful streams elsewhere, so they now run for real
    # (VERDICT r17 item 7): each executes one availableNow pass to
    # produce its schema, exactly what the driver compares.
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


def test_check_correctness_rejects_unknown_query_names(monkeypatch, capsys):
    """A typo'd query name must exit 2 before any Spark session, not
    filter the run to nothing and certify '0/0 pass' with exit 0 —
    the subset-mirror twin of the r14/r15 unknown-flag CLI fixes."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    import check_correctness as cc

    monkeypatch.setattr(
        sys, "argv",
        ["check_correctness.py", "/root/testdata/sf0.01", "not_a_query"],
    )
    assert cc.main() == 2
    err = capsys.readouterr().err
    assert "unknown queries" in err and "not_a_query" in err
    # forgetting the sf_dir puts a query name in its slot — caught
    # with a pointed message, not a parquet-path error later
    monkeypatch.setattr(
        sys, "argv", ["check_correctness.py", "reflux_limit_offset"]
    )
    assert cc.main() == 2
    err = capsys.readouterr().err
    assert "first argument is the sf_dir" in err
