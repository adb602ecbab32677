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


# ------------------------------------------------------------------
# Typed parser (README.md:49 value surface) — JVM column expressions
# must agree with LineProtocol.parse(line, typed=True) line by line.
# ------------------------------------------------------------------

from refluxdb_spark.sources.lineprotocol import (  # noqa: E402
    explode_typed_fields,
    parse_lines_typed_df,
)

TYPED_GOOD = [
    # the reference's own four parser-test lines (protocol.rs:155-183)
    'mySingleTagMeasurement,tag1=value1 fieldKey1="fieldValue" 1556813561098000000',
    'myMultipleTagMeasurement,tag1=value1,tag2=value2 fieldKey="fieldValue" 1556813561098000000',
    'mySingleFieldKey fieldKey="fieldValue" 1556813561098000000',
    'myMultipleFieldKey fieldKey1="fieldValue",fieldKey2="oi" 1556813561098000000',
    # all four types on one line; escapes; delimiters inside quotes
    'm,host=a f=1.5,n=42i,ok=true,off=FALSE,s="hi there, \\"bob\\"\\\\" 99',
    'm s="a,b=c d" -62135596800000000',
    'm b=t,c=f,d=T,e=F 5',
    'm f=-3.5,g=1e-3,h=7 1000',
    'm,empty=,ok=v x=1,y= 1000',  # empty tag/field VALUES skipped
    'm lo=-9223372036854775808i,hi=9223372036854775807i 1',
]
TYPED_BAD = [
    "", "m", "m f=1.0", "m x=notanumber 1000", "m x=1 notats",
    'm s="unterminated 1', "m x=99999999999999999999999i 1",
    "m x=1 1 junk", 'm "o"=1 1', ",t=1 f=2 3", "m x=1,abc 5",
    'm x=a"b 5', "m x=,y= 5", "m x=1, 5", "m ,x=1 5", 'm"q x=1 5',
    'm x=1 "9"',
]


def _typed_fieldmap(fields):
    return {
        e.key: (
            e.vf if e.vtype == "float"
            else e.vi if e.vtype == "int"
            else e.vb if e.vtype == "bool"
            else e.vs
        )
        for e in fields
    }


def test_typed_spark_parser_matches_python_spec(spark):
    df = spark.createDataFrame([(l,) for l in TYPED_GOOD], "value string")
    rows = {r.raw: r for r in parse_lines_typed_df(df).collect()}
    for line in TYPED_GOOD:
        expected = LineProtocol.parse(line, typed=True)
        got = rows[line]
        assert got.error is None, f"{line}: unexpected error {got.error}"
        assert got.measurement == expected.measurement_name
        assert dict(got.tags or {}) == expected.tag_set
        assert _typed_fieldmap(got.fields) == expected.field_set
        assert got.ts == expected.timestamp


def test_typed_spark_parser_dead_letters_what_python_rejects(spark):
    df = spark.createDataFrame([(l,) for l in TYPED_BAD if l], "value string")
    out = parse_lines_typed_df(df).collect()
    assert all(r.error is not None for r in out), [
        (r.raw, r.error) for r in out if r.error is None
    ]
    for r in out:
        try:
            LineProtocol.parse(r.raw, typed=True)
            raise AssertionError(
                f"python spec accepted {r.raw!r} but spark flagged it: {r.error}"
            )
        except ParseError:
            pass


def test_typed_equivalence_on_generated_corpus(spark):
    """One Spark pass over a seeded pseudo-random corpus of serialized
    typed records — the distributed-scale twin of the Hypothesis
    round-trip, pinning JVM == Python on hundreds of lines at once."""
    import random

    rng = random.Random(20260816)
    alphabet = "abcXYZ019_-."
    str_payload = (
        'ab cd,e=f "quoted" back\\slash'
        "  plain"
    )

    def ident():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))

    def value():
        k = rng.randint(0, 3)
        if k == 0:
            return round(rng.uniform(-1e6, 1e6), rng.randint(0, 6))
        if k == 1:
            return rng.randint(-(2**63), 2**63 - 1)
        if k == 2:
            return rng.random() < 0.5
        n = rng.randint(0, 12)
        start = rng.randint(0, len(str_payload) - 1)
        return str_payload[start:start + n]

    records = [
        LineProtocol(
            ident(),
            {ident(): ident() for _ in range(rng.randint(0, 3))},
            {ident(): value() for _ in range(rng.randint(1, 4))},
            rng.randint(-(2**62), 2**62),
        )
        for _ in range(300)
    ]
    lines = [lp.serialize() for lp in records]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    rows = {r.raw: r for r in parse_lines_typed_df(df).collect()}
    for lp, line in zip(records, lines):
        expected = LineProtocol.parse(line, typed=True)
        got = rows[line]
        assert got.error is None, f"{line!r}: {got.error}"
        gf = _typed_fieldmap(got.fields)
        assert gf == expected.field_set, (line, gf, expected.field_set)
        for k, v in expected.field_set.items():
            assert type(gf[k]) is type(v), (line, k, gf[k], v)
        assert dict(got.tags or {}) == expected.tag_set
        assert got.ts == expected.timestamp


def test_explode_typed_fields_shape(spark):
    df = spark.createDataFrame([(TYPED_GOOD[4],)], "value string")
    out = explode_typed_fields(parse_lines_typed_df(df)).collect()
    by_name = {r.name: r for r in out}
    assert by_name["f"].value_type == "float" and by_name["f"].value == 1.5
    assert by_name["n"].value_type == "int" and by_name["n"].value_int == 42
    # numeric view: the int also lands in `value` as double
    assert by_name["n"].value == 42.0
    assert by_name["ok"].value_bool is True and by_name["ok"].value is None
    assert by_name["off"].value_bool is False
    assert by_name["s"].value_type == "string"
    assert by_name["s"].value_str == 'hi there, "bob"\\'
    assert by_name["s"].value is None and by_name["s"].value_int is None
