"""Gateway validator tests — SURVEY §2.1 O11-O13 semantics + quirk fixes."""

import pytest

from refluxdb_spark.errors import ValidationError
from refluxdb_spark.gateway import validate_query


def test_simple_select():
    assert validate_query("SELECT * FROM test") == ["test"]


def test_where_and_limit():
    q = "SELECT id, time, value FROM cpu WHERE value > 0.5 LIMIT 10"
    assert validate_query(q) == ["cpu"]


@pytest.mark.parametrize(
    "q",
    [
        "INSERT INTO t VALUES (1)",
        "DELETE FROM t",
        "UPDATE t SET x = 1",
        "DROP TABLE t",
        "CREATE TABLE t (x INT)",
        "TRUNCATE TABLE t",
    ],
)
def test_mutations_blocked(q):  # persistence.rs:147-153
    with pytest.raises(ValidationError):
        validate_query(q)


def test_multi_statement_rejected():  # Q9 fix
    with pytest.raises(ValidationError, match="multi-statement"):
        validate_query("SELECT * FROM t; SELECT * FROM u")


def test_created_at_allowed_in_default_mode():  # Q3 fix
    assert validate_query("SELECT created_at FROM test") == ["test"]


def test_created_at_rejected_in_strict_compat():  # Q3 reproduced
    with pytest.raises(ValidationError):
        validate_query("SELECT created_at FROM test", strict_compat=True)


def test_join_tables_all_extracted():  # Q8 fix
    q = "SELECT * FROM a JOIN b ON a.id = b.id LEFT JOIN c ON b.id = c.id"
    assert validate_query(q) == ["a", "b", "c"]


def test_keyword_inside_string_literal_ok():
    assert validate_query("SELECT * FROM t WHERE name = 'drop table'") == ["t"]


def test_empty_query_rejected():
    with pytest.raises(ValidationError):
        validate_query("   ")


def test_non_select_rejected():
    with pytest.raises(ValidationError, match="SELECT"):
        validate_query("SHOW TABLES")


def test_cte_allowed_and_not_a_table():
    q = "WITH x AS (SELECT * FROM base) SELECT * FROM x"
    assert validate_query(q) == ["base"]


def test_extract_from_not_a_table():
    q = "SELECT EXTRACT(YEAR FROM time) AS y FROM cpu"
    assert validate_query(q) == ["cpu"]


def test_substring_from_and_trim_from():
    q = "SELECT SUBSTRING(name FROM 1 FOR 2), TRIM(LEADING 'x' FROM name) FROM cpu"
    assert validate_query(q) == ["cpu"]
