"""Spark column-expression parser must agree with the pure-Python spec
parser on every corpus line, and dead-letter instead of failing."""

from pyspark.sql import functions as F

from refluxdb_spark.errors import ParseError
from refluxdb_spark.protocol import LineProtocol
from refluxdb_spark.sources.lineprotocol import explode_fields, parse_lines_df

CORPUS_GOOD = [
    "test,host=server,region=us-east1 value=0.80 1234567890000000000",
    "mySingleTagMeasurement,tag1=value1 fieldKey1=42.0 1556813561098000000",
    "myMultipleTagMeasurement,tag1=value1,tag2=value2 fieldKey=1.5 1556813561098000000",
    "mySingleFieldKey fieldKey=7 1556813561098000000",
    "myMultipleFieldKey fieldKey1=1.0,fieldKey2=2.0 1556813561098000000",
    "m,empty=,ok=v x=1 1000",
    "negative x=-3.5 1000",
    "sci x=1e-3 1000",
]
CORPUS_BAD = [
    "",
    "m fieldKey=1.0",
    "m",
    "m x=notanumber 1000",
    "m x=1 notatimestamp",
]


def test_spark_parser_matches_python_spec(spark):
    df = spark.createDataFrame([(l,) for l in CORPUS_GOOD], "value string")
    rows = {r.raw: r for r in parse_lines_df(df).collect()}
    for line in CORPUS_GOOD:
        expected = LineProtocol.parse(line)
        got = rows[line]
        assert got.error is None, f"{line}: unexpected error {got.error}"
        assert got.measurement == expected.measurement_name
        assert dict(got.tags or {}) == expected.tag_set
        assert dict(got.fields or {}) == expected.field_set
        assert got.ts == expected.timestamp


def test_spark_parser_dead_letters_bad_lines(spark):
    df = spark.createDataFrame([(l,) for l in CORPUS_BAD if l], "value string")
    out = parse_lines_df(df).collect()
    assert all(r.error is not None for r in out)
    for r in out:
        try:
            LineProtocol.parse(r.raw)
            raise AssertionError(f"python spec accepted {r.raw!r} but spark flagged it")
        except ParseError:
            pass


def test_explode_fields_row_count(spark):
    df = spark.createDataFrame([(l,) for l in CORPUS_GOOD], "value string")
    exploded = explode_fields(parse_lines_df(df))
    total_fields = sum(len(LineProtocol.parse(l).field_set) for l in CORPUS_GOOD)
    assert exploded.count() == total_fields
    multi = exploded.filter(F.col("series") == "myMultipleFieldKey").collect()
    assert {(r.name, r.value) for r in multi} == {("fieldKey1", 1.0), ("fieldKey2", 2.0)}
