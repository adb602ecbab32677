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
