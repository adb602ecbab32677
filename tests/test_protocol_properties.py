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
