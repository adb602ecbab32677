"""Line-protocol parser unit tests.

Corpus mirrors the reference's four round-trip tests
(``protocol.rs:150-190``) with numeric field values (the reference's
quoted-string values cannot parse as f64 — SURVEY §5) plus the README
demo line and the negative cases from FIXTURES.md F1.
"""

import pytest

from refluxdb_spark.errors import ParseError
from refluxdb_spark.protocol import LineProtocol


def test_readme_demo_line():
    # README.md:20
    lp = LineProtocol.parse("test,host=server,region=us-east1 value=0.80 1234567890000000000")
    assert lp.measurement_name == "test"
    assert lp.tag_set == {"host": "server", "region": "us-east1"}
    assert lp.field_set == {"value": 0.80}
    assert lp.timestamp == 1234567890000000000


def test_single_tag():  # protocol.rs:153-161
    lp = LineProtocol.parse("m,tag1=value1 fieldKey1=42.0 1556813561098000000")
    assert lp.tag_set == {"tag1": "value1"}
    assert lp.field_set == {"fieldKey1": 42.0}


def test_multiple_tags():  # protocol.rs:162-169
    lp = LineProtocol.parse("m,tag1=value1,tag2=value2 fieldKey=1.5 1556813561098000000")
    assert lp.tag_set == {"tag1": "value1", "tag2": "value2"}


def test_single_fieldvalue_no_tags():  # protocol.rs:171-178
    lp = LineProtocol.parse("mySingleFieldKey fieldKey=7 1556813561098000000")
    assert lp.tag_set == {}
    assert lp.field_set == {"fieldKey": 7.0}


def test_multiple_fieldvalues():  # protocol.rs:180-189
    lp = LineProtocol.parse("m fieldKey1=1.0,fieldKey2=2.0 1556813561098000000")
    assert lp.field_set == {"fieldKey1": 1.0, "fieldKey2": 2.0}


def test_roundtrip_semantic():
    line = "m,a=b x=1.5,y=2 1000"
    lp = LineProtocol.parse(line)
    assert LineProtocol.parse(lp.serialize()) == lp


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("", "empty line"),  # protocol.rs:79-81
        ("m fieldKey=1.0", "missing timestamp"),  # protocol.rs:142-144
        ("m", "missing fieldset"),  # protocol.rs:125-127
        ("m x=notanumber 1000", "non-numeric"),  # Q6: reference panics
        ("m x=1 notatimestamp", "bad timestamp"),
    ],
)
def test_negative_cases(bad, msg):
    with pytest.raises(ParseError, match=msg):
        LineProtocol.parse(bad)


def test_empty_tag_values_skipped():  # protocol.rs:34-38
    lp = LineProtocol.parse("m,empty=,ok=v x=1 1000")
    assert lp.tag_set == {"ok": "v"}


# ------------------------------------------------------------------
# Typed field values (parse(line, typed=True)) — the reference's
# DECLARED value surface (README.md:49 "to be float, int, string and
# bool"); its own four unit tests use quoted string field values the
# f64-only parser cannot ingest (protocol.rs:155,164,173,183).
# ------------------------------------------------------------------

REFERENCE_TEST_LINES = [
    # protocol.rs:155,164,173,183 — verbatim
    'mySingleTagMeasurement,tag1=value1 fieldKey1="fieldValue" 1556813561098000000',
    'myMultipleTagMeasurement,tag1=value1,tag2=value2 fieldKey="fieldValue" 1556813561098000000',
    'mySingleFieldKey fieldKey="fieldValue" 1556813561098000000',
    'myMultipleFieldKey fieldKey1="fieldValue",fieldKey2="oi" 1556813561098000000',
]


@pytest.mark.parametrize("line", REFERENCE_TEST_LINES)
def test_reference_parser_test_lines_roundtrip_verbatim(line):
    """The reference's own four parser tests assert parse->serialize
    is the identity; typed mode makes them pass HERE, byte-for-byte."""
    lp = LineProtocol.parse(line, typed=True)
    assert lp.serialize() == line
    assert all(isinstance(v, str) for v in lp.field_set.values())


def test_typed_all_four_value_types():
    lp = LineProtocol.parse(
        'cpu,host=a usage=0.8,cores=16i,hot=true,off=f,model="Xeon E5" 99',
        typed=True,
    )
    assert lp.field_set == {
        "usage": 0.8, "cores": 16, "hot": True, "off": False, "model": "Xeon E5",
    }
    assert isinstance(lp.field_set["cores"], int)
    assert not isinstance(lp.field_set["usage"], int)
    assert isinstance(lp.field_set["hot"], bool)


def test_typed_string_escapes_and_delimiters():
    """Quoted values may contain spaces, commas, '=' and escaped
    quotes/backslashes — the quote-aware tokenizer must keep them."""
    lp = LineProtocol.parse(
        'm s="a,b=c d",t="say \\"hi\\"",u="back\\\\slash" 5', typed=True
    )
    assert lp.field_set == {
        "s": "a,b=c d", "t": 'say "hi"', "u": "back\\slash",
    }
    back = LineProtocol.parse(lp.serialize(), typed=True)
    assert back.field_set == lp.field_set


def test_typed_bool_literal_variants():
    lp = LineProtocol.parse("m a=t,b=T,c=true,d=True,e=TRUE,f=f,g=FALSE 1", typed=True)
    assert lp.field_set == {
        "a": True, "b": True, "c": True, "d": True, "e": True,
        "f": False, "g": False,
    }
    # canonical serialization: true/false
    assert "a=true" in lp.serialize() and "g=false" in lp.serialize()


@pytest.mark.parametrize(
    "bad,msg",
    [
        ('m s="unterminated 1', "bad string"),
        ("m x=99999999999999999999999i 1", "out of i64 range"),
        ("m x=-9223372036854775809i 1", "out of i64 range"),
        ("m x=1 1 junk", "trailing garbage"),
        ('m "key"=1 1', "quote in field key"),
        ("m x=1, 5", "bad fieldset segment"),
        ("m ,x=1 5", "bad fieldset segment"),
        ('m x=a"b 5', "bad string"),
        ('m"oops x=1 5', "quote in measurement"),
    ],
)
def test_typed_negative_cases(bad, msg):
    with pytest.raises(ParseError, match=msg):
        LineProtocol.parse(bad, typed=True)


def test_typed_i64_boundaries_accepted():
    lp = LineProtocol.parse(
        "m lo=-9223372036854775808i,hi=9223372036854775807i 1", typed=True
    )
    assert lp.field_set == {"lo": -(2**63), "hi": 2**63 - 1}


def test_untyped_mode_unchanged_rejects_typed_values():
    """Default (reference-faithful f64) mode still dead-letters every
    typed wire form — the Q6 contract is unchanged."""
    for bad in ('m x=42i 1', 'm x=true 1', 'm x="s" 1'):
        with pytest.raises(ParseError):
            LineProtocol.parse(bad)
