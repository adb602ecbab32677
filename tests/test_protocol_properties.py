"""Property-based tests (hypothesis) for the line-protocol parser:
serialize->parse round-trips for arbitrary valid records, and the
parser never raises anything but ParseError on arbitrary input."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from refluxdb_spark.errors import ParseError
from refluxdb_spark.protocol import LineProtocol

# identifiers the grammar can represent: no whitespace, comma, '='
ident = st.text(
    alphabet=string.ascii_letters + string.digits + "_-.",
    min_size=1,
    max_size=20,
)
finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e15, max_value=1e15,
)


@given(
    measurement=ident,
    tags=st.dictionaries(ident, ident, max_size=5),
    fields=st.dictionaries(ident, finite_floats, min_size=1, max_size=5),
    ts=st.integers(min_value=0, max_value=2**62),
)
@settings(max_examples=200, deadline=None)
def test_serialize_parse_roundtrip(measurement, tags, fields, ts):
    lp = LineProtocol(measurement, dict(tags), dict(fields), ts)
    back = LineProtocol.parse(lp.serialize())
    assert back.measurement_name == lp.measurement_name
    assert back.tag_set == lp.tag_set
    assert back.timestamp == lp.timestamp
    assert set(back.field_set) == set(lp.field_set)
    for k, v in lp.field_set.items():
        assert back.field_set[k] == v  # float repr round-trips exactly


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parser_total_on_garbage(line):
    """Any input either parses or raises ParseError — never IndexError,
    ValueError, or a crash (the reference panics on several of these,
    protocol.rs:42, Q6)."""
    try:
        lp = LineProtocol.parse(line)
        assert lp.measurement_name != ""
        assert lp.field_set
    except ParseError:
        pass


# ------------------------------------------------------------------
# Typed mode (README.md:49 value surface): round-trip + totality
# ------------------------------------------------------------------

# printable payload for quoted strings: anything except control chars;
# quotes and backslashes exercise the escaping
string_payload = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=0x20, max_codepoint=0x7E
    ),
    max_size=30,
)
typed_value = st.one_of(
    finite_floats,
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    string_payload,
)


@given(
    measurement=ident,
    tags=st.dictionaries(ident, ident, max_size=4),
    fields=st.dictionaries(ident, typed_value, min_size=1, max_size=5),
    ts=st.integers(min_value=-(2**62), max_value=2**62),
)
@settings(max_examples=200, deadline=None)
def test_typed_serialize_parse_roundtrip(measurement, tags, fields, ts):
    """serialize -> parse(typed=True) is the identity on values AND
    types (bool is not int, int is not float) for the full typed
    value surface, including strings with spaces/commas/escapes."""
    lp = LineProtocol(measurement, dict(tags), dict(fields), ts)
    back = LineProtocol.parse(lp.serialize(), typed=True)
    assert back.measurement_name == lp.measurement_name
    assert back.tag_set == lp.tag_set
    assert back.timestamp == lp.timestamp
    assert back.field_set == lp.field_set
    for k, v in lp.field_set.items():
        assert type(back.field_set[k]) is type(v), (k, v, back.field_set[k])


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_typed_parser_total_on_garbage(line):
    """Typed mode is as total as the default mode: any input parses or
    raises ParseError — never IndexError/ValueError/RecursionError."""
    try:
        lp = LineProtocol.parse(line, typed=True)
        assert lp.measurement_name != ""
        assert lp.field_set
    except ParseError:
        pass


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_typed_accepts_superset_of_untyped(line):
    """Every line the default f64 grammar accepts, typed mode accepts
    with IDENTICAL float values — except the deliberate strictness
    divergences (trailing tokens after the timestamp; comma artifacts
    producing empty fieldset segments), which typed mode rejects."""
    try:
        untyped = LineProtocol.parse(line)
    except ParseError:
        return
    try:
        typed = LineProtocol.parse(line, typed=True)
    except ParseError:
        tokens = line.split()
        fieldset = tokens[1] if len(tokens) > 1 else ""
        assert (
            len(tokens) > 3
            or '"' in line
            or fieldset.startswith(",") or fieldset.endswith(",")
            or ",," in fieldset
            or any(  # segment with no '=' (untyped silently skips it)
                "=" not in seg for seg in fieldset.split(",") if seg != ""
            )
            # typed tokenizes on ASCII whitespace only, matching the
            # JVM parser's \s (Java regex \s is ASCII); Python's
            # str.split() also splits on unicode spaces, so untyped
            # Python alone accepts those lines
            or any(
                ch.isspace() and ch not in " \t\n\r\x0b\x0c" for ch in line
            )
        ), f"typed rejected {line!r} without a documented strictness reason"
        return
    assert typed.measurement_name == untyped.measurement_name
    assert typed.tag_set == untyped.tag_set
    assert typed.timestamp == untyped.timestamp
    for k, v in untyped.field_set.items():
        tv = typed.field_set[k]
        if isinstance(tv, bool) or isinstance(tv, int):
            assert float(tv) == v
        elif isinstance(tv, float):
            assert tv == v
