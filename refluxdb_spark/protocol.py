"""Influx line-protocol parse/serialize (driver-side reference semantics).

Grammar (reference ``protocol.rs:74-76``)::

    <measurement>[,<tag_key>=<tag_value>...] <field_key>=<field_value>[,...] <timestamp>

This module is the *semantic spec*: a small pure-Python implementation
mirroring the reference parser (``protocol.rs:78-147``) used for unit
tests and single-line paths. The HOT path — parsing millions of lines —
is the column-expression parser in ``sources/lineprotocol.py`` which
implements the same semantics JVM-side (no Python per row).

Deliberate divergences from the reference (quirk register, SURVEY §7):
- non-numeric field values become parse *errors*, not panics (Q6,
  ``protocol.rs:42`` does ``value.parse::<f64>().unwrap()``),
- empty tag/field keys or values are skipped, as the reference does
  (``protocol.rs:34-44``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from refluxdb_spark.errors import ParseError


@dataclass
class LineProtocol:
    """One parsed line. Mirrors ``protocol.rs:4-10``."""

    measurement_name: str
    tag_set: dict[str, str] = field(default_factory=dict)
    field_set: dict[str, float] = field(default_factory=dict)
    timestamp: int = 0

    def tag(self, key: str, value: str) -> None:
        # protocol.rs:34-38 — skip empty keys/values
        if key != "" and value != "":
            self.tag_set[key] = value

    def field(self, key: str, value: str) -> None:
        # protocol.rs:40-44 — reference unwraps parse::<f64>() (panics);
        # we raise ParseError which the batch path routes to a DLQ.
        if key == "" or value == "":
            return
        try:
            self.field_set[key] = float(value)
        except ValueError as exc:
            raise ParseError(f"non-numeric field value {value!r} for key {key!r}") from exc

    @classmethod
    def parse(cls, line: str) -> "LineProtocol":
        """Parse one line. Mirrors ``protocol.rs:78-147``:
        whitespace-split into [measurement+tags, fieldset, timestamp];
        comma-split each; ``=``-split pairs; timestamp REQUIRED
        (``protocol.rs:142-144``).
        """
        tokens = line.split()
        if not tokens:
            raise ParseError("empty line")  # protocol.rs:79-81

        lp = cls(measurement_name="")

        # token 0: measurement[,k=v...]   (protocol.rs:87-107)
        head = tokens[0].split(",")
        lp.measurement_name = head[0]
        if lp.measurement_name == "":
            raise ParseError("empty measurement name")
        for pair in head[1:]:
            k, sep, v = pair.partition("=")
            if sep:
                lp.tag(k, v)

        # token 1: fieldset  (protocol.rs:109-128; required)
        if len(tokens) < 2:
            raise ParseError("missing fieldset")  # protocol.rs:125-127
        for pair in tokens[1].split(","):
            k, sep, v = pair.partition("=")
            if sep:
                lp.field(k, v)
        if not lp.field_set:
            raise ParseError("missing fieldset")

        # token 2: timestamp — REQUIRED (protocol.rs:142-144)
        if len(tokens) < 3:
            raise ParseError("missing timestamp")
        try:
            lp.timestamp = int(tokens[2])
        except ValueError as exc:
            raise ParseError(f"bad timestamp {tokens[2]!r}") from exc
        return lp

    def serialize(self) -> str:
        """Canonical line (echo mode). Mirrors ``protocol.rs:46-72``."""
        out = self.measurement_name
        for k, v in self.tag_set.items():
            out += f",{k}={v}"
        out += " " + ",".join(f"{k}={_fmt_float(v)}" for k, v in self.field_set.items())
        out += f" {self.timestamp}"
        return out


def _fmt_float(v: float) -> str:
    # Match Rust's Display for f64 closely enough for round-trip tests:
    # integral values print without trailing .0? Rust prints 42 as "42".
    if v == int(v):
        return str(int(v))
    return repr(v)
