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


# ------------------------------------------------------------------
# Property fuzzing (VERDICT r01 item 8): pin the token validator's
# edges against generated SQL. Two invariants:
#   1. NO mutation statement is ever accepted, however disguised
#      (comments, case, string literals, trailing statements);
#   2. generated SELECT shapes that Spark SQL itself parses — aliases,
#      quoted identifiers, CTEs, joins, set-ops, keyword-bearing
#      string literals — are accepted with the right tables extracted.
# ------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_TBL = st.sampled_from(["cpu", "mem", "test", "events_5m"])
_COL = st.sampled_from(["value", "name", "time", "created_at", "tags"])
_MUT = st.sampled_from(
    ["INSERT INTO {t} VALUES (1)", "DELETE FROM {t}", "UPDATE {t} SET x=1",
     "DROP TABLE {t}", "CREATE TABLE {t} (x INT)", "TRUNCATE TABLE {t}",
     "ALTER TABLE {t} ADD COLUMN y INT", "MERGE INTO {t} USING u ON 1=1"]
)
_WS = st.sampled_from(["", " ", "\n", "\t", " /* c */ ", " -- c\n"])
# literals deliberately stuffed with blocklist words / quote tricks
_LIT = st.sampled_from(
    ["'drop table x'", "'DELETE FROM y'", "'it''s; an insert'", "'update'"]
)


@given(ws=_WS, mut=_MUT, t=_TBL, case=st.booleans())
@settings(max_examples=60, deadline=None)
def test_fuzz_mutations_never_accepted(ws, mut, t, case):
    q = ws + mut.format(t=t)
    if case:
        q = q.lower()
    with pytest.raises(ValidationError):
        validate_query(q)


@given(sel=_COL, t=_TBL, mut=_MUT, ws=_WS)
@settings(max_examples=60, deadline=None)
def test_fuzz_piggybacked_mutation_never_accepted(sel, t, mut, ws):
    """A valid SELECT with a mutation smuggled behind it (the classic
    injection the reference would EXECUTE after validating only the
    first statement, quirk Q9) must be rejected."""
    q = f"SELECT {sel} FROM {t};{ws}{mut.format(t=t)}"
    with pytest.raises(ValidationError):
        validate_query(q)


@given(c1=_COL, c2=_COL, t=_TBL, lit=_LIT, ws=_WS, alias=st.booleans())
@settings(max_examples=60, deadline=None)
def test_fuzz_selects_accepted_with_tables(c1, c2, t, lit, ws, alias):
    a = " AS a1" if alias else ""
    q = f"SELECT {c1}{a}, {c2} FROM {t}{ws} WHERE {c1} != {lit}"
    assert validate_query(q) == [t]


@given(t1=_TBL, t2=_TBL, c=_COL, ws=_WS)
@settings(max_examples=40, deadline=None)
def test_fuzz_join_and_cte_tables_extracted(t1, t2, c, ws):
    q = (
        f"WITH w AS (SELECT {c} FROM {t1}){ws} "
        f"SELECT w.{c} FROM w JOIN {t2} ON w.{c} = {t2}.{c}"
    )
    got = validate_query(q)
    assert t1 in got and t2 in got and "w" not in got


@given(t1=_TBL, t2=_TBL, c=_COL, op=st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
@settings(max_examples=40, deadline=None)
def test_fuzz_setops_accepted(t1, t2, c, op):
    q = f"SELECT {c} FROM {t1} {op} SELECT {c} FROM {t2}"
    got = validate_query(q)
    assert set(got) == {t1, t2}


def test_fuzzed_shapes_parse_in_spark(spark):
    """The generator above only emits shapes Spark SQL itself accepts —
    anchor that with a direct parse of each template family."""
    spark.createDataFrame([(1.0, "a")], "value double, name string").createOrReplaceTempView("cpu")
    spark.createDataFrame([(1.0, "a")], "value double, name string").createOrReplaceTempView("mem")
    for q in [
        "SELECT value AS a1, name FROM cpu WHERE name != 'drop table x'",
        "WITH w AS (SELECT value FROM cpu) SELECT w.value FROM w JOIN mem ON w.value = mem.value",
        "SELECT name FROM cpu UNION ALL SELECT name FROM mem",
        "SELECT name FROM cpu INTERSECT SELECT name FROM mem",
    ]:
        assert validate_query(q)  # gateway accepts
        spark.sql(q)  # and Spark parses/analyzes the same text


# --- r2 carry-over (VERDICT item 8): quoted/backticked identifiers and
# --- derived-table / lateral shapes, plus the documented reject list.

# Spark dialect: backticks quote identifiers; double quotes are
# string literals (default ANSI off) — so only backticks fuzz here
_QUOTE = st.sampled_from(["{t}", "`{t}`"])


@given(t=_TBL, quote=_QUOTE, c=_COL)
@settings(max_examples=40, deadline=None)
def test_fuzz_quoted_table_identifiers_extracted(t, quote, c):
    q = f"SELECT {c} FROM {quote.format(t=t)} WHERE {c} IS NOT NULL"
    assert validate_query(q) == [t]


@given(t=_TBL, c=_COL, alias=st.sampled_from(["d", "`d`"]), ws=_WS)
@settings(max_examples=40, deadline=None)
def test_fuzz_derived_table_alias_not_a_table(t, c, alias, ws):
    q = f"SELECT {c} FROM{ws}(SELECT {c} FROM {t}) {alias}"
    assert validate_query(q) == [t]


@given(t1=_TBL, t2=_TBL, c=_COL)
@settings(max_examples=40, deadline=None)
def test_fuzz_lateral_subquery_join(t1, t2, c):
    q = (
        f"SELECT a.{c} FROM {t1} a JOIN LATERAL "
        f"(SELECT {c} FROM {t2} WHERE {t2}.{c} = a.{c}) b"
    )
    got = validate_query(q)
    assert set(got) == {t1, t2}


@given(kw=st.sampled_from(["drop", "insert", "delete", "update", "create"]),
       quote=st.sampled_from(['"{k}"', "`{k}`"]))
@settings(max_examples=20, deadline=None)
def test_fuzz_documented_reject_quoted_mutation_identifier(kw, quote):
    """Documented conservative reject: a mutation keyword as a QUOTED
    identifier is still refused — the token validator will not vouch
    for it, and no legitimate series carries that name."""
    q = f"SELECT * FROM {quote.format(k=kw)}"
    with pytest.raises(ValidationError):
        validate_query(q)


def test_lateral_shapes_parse_in_spark(spark):
    """Anchor: the lateral/derived/quoted shapes the fuzzers accept are
    shapes Spark SQL itself parses."""
    spark.createDataFrame([(1.0, "a")], "value double, name string").createOrReplaceTempView("cpu")
    spark.createDataFrame([(1.0, "a")], "value double, name string").createOrReplaceTempView("mem")
    for q in [
        "SELECT name FROM `cpu` WHERE name IS NOT NULL",
        "SELECT name FROM (SELECT name FROM cpu) d",
        "SELECT a.name FROM cpu a JOIN LATERAL (SELECT value FROM mem WHERE mem.name = a.name) b",
    ]:
        assert validate_query(q)
        spark.sql(q)


class TestAstValidate:
    """AST-grade layer: Catalyst's parser decides the statement type."""

    def test_pure_queries_pass(self, spark):
        from refluxdb_spark.gateway import ast_validate

        for q in [
            "SELECT 1",
            "WITH x AS (SELECT 1 AS a) SELECT * FROM x",
            "SELECT 1 UNION SELECT 2",
            "SELECT * FROM t WHERE name = 'DROP TABLE x'",
        ]:
            assert ast_validate(spark, q) is not None

    def test_mutations_and_utilities_rejected(self, spark):
        import pytest

        from refluxdb_spark.errors import ValidationError
        from refluxdb_spark.gateway import ast_validate

        for q in [
            "INSERT INTO t VALUES (1)",
            "DELETE FROM t WHERE 1=1",
            "UPDATE t SET a=1",
            "MERGE INTO t USING s ON t.a=s.a WHEN MATCHED THEN DELETE",
            "CREATE TABLE t (a INT)",
            "DROP TABLE t",
            "ALTER TABLE t ADD COLUMN b INT",
            "TRUNCATE TABLE t",
            "EXPLAIN SELECT 1",
            "SET spark.x=1",
            "CACHE TABLE t",
            "SHOW TABLES",
            "DESCRIBE TABLE t",
        ]:
            with pytest.raises(ValidationError):
                ast_validate(spark, q)

    def test_multi_statement_is_a_parse_error(self, spark):
        import pytest

        from refluxdb_spark.errors import ValidationError
        from refluxdb_spark.gateway import ast_validate

        with pytest.raises(ValidationError):
            ast_validate(spark, "SELECT 1; SELECT 2")

    def test_engine_query_runs_both_layers(self, spark, tmp_path):
        import pytest

        from refluxdb_spark.engine import RefluxEngine
        from refluxdb_spark.errors import ValidationError

        eng = RefluxEngine(spark, str(tmp_path / "wh"))
        eng.write_lines(["m,host=a value=1.5 1000000000000000000"])
        assert eng.query("SELECT name, value FROM m").count() == 1
        # statements the TOKEN layer alone already rejects, and ones
        # only grammar understanding can classify, both 400
        with pytest.raises(ValidationError):
            eng.query("EXPLAIN SELECT * FROM m")
        with pytest.raises(ValidationError):
            eng.query("INSERT INTO m VALUES (1)")


@given(ws=_WS, mut=_MUT, t=_TBL, case=st.booleans())
@settings(max_examples=40, deadline=None)
def test_fuzz_ast_layer_rejects_mutations_too(spark, ws, mut, t, case):
    """Both validation layers independently reject every fuzzed
    mutation — the AST layer by Catalyst's grammar, regardless of
    casing/whitespace/comment obfuscation."""
    from refluxdb_spark.gateway import ast_validate

    q = ws + mut.format(t=t)
    if case:
        q = q.lower()
    with pytest.raises(ValidationError):
        ast_validate(spark, q)


@given(c1=_COL, c2=_COL, t=_TBL, lit=_LIT, ws=_WS)
@settings(max_examples=40, deadline=None)
def test_fuzz_ast_layer_accepts_selects(spark, c1, c2, t, lit, ws):
    """Every SELECT the token layer accepts (including blocklist words
    inside string literals) also passes the grammar layer — the two
    layers never disagree on the accepted surface."""
    from refluxdb_spark.gateway import ast_validate

    q = f"SELECT {c1}, {c2} FROM {t}{ws} WHERE {c1} != {lit}"
    assert ast_validate(spark, q) is not None
