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

import re
from dataclasses import dataclass, field

from refluxdb_spark.errors import ParseError

#: i64 bounds — the JVM parser's BIGINT try_cast nulls out-of-range
#: integers, so the spec parser must reject them identically.
_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1

_INT_RE = re.compile(r"^-?[0-9]+i$")
_TRUE_LITERALS = {"t", "T", "true", "True", "TRUE"}
_FALSE_LITERALS = {"f", "F", "false", "False", "FALSE"}
_STRING_RE = re.compile(r'^"(?:[^"\\]|\\.)*"$')


def _split_outside_quotes(s: str, seps: str) -> list[str]:
    """Split ``s`` on any of ``seps`` occurring OUTSIDE double quotes
    (quotes toggle on unescaped ``"``). Runs of whitespace separators
    collapse; empty segments from consecutive non-space separators are
    kept (mirrors ``str.split`` vs ``split(',')`` semantics)."""
    out: list[str] = []
    buf: list[str] = []
    in_q = False
    esc = False
    ws = seps.isspace()
    for ch in s:
        if in_q:
            buf.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_q = False
            continue
        if ch == '"':
            in_q = True
            buf.append(ch)
        elif ch in seps:
            if buf or not ws:
                out.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf or (out and not ws):
        out.append("".join(buf))
    return out


@dataclass
class LineProtocol:
    """One parsed line. Mirrors ``protocol.rs:4-10``.

    ``field_set`` values are ``float`` in the default (reference-
    faithful f64-only) mode; in typed mode (``parse(line, typed=True)``)
    they may be ``float``, ``int`` (the ``42i`` suffix form), ``bool``
    (``t/T/true/True/TRUE`` and the f-variants), or ``str`` (double-
    quoted with ``\\"`` / ``\\\\`` escapes) — the full value surface the
    reference DECLARES (``README.md:49`` "to be float, int, string and
    bool") and its own unit tests use (``protocol.rs:155,164,173,183``
    all carry quoted string field values) but never built.
    """

    measurement_name: str
    tag_set: dict[str, str] = field(default_factory=dict)
    field_set: dict[str, "float | int | bool | str"] = field(default_factory=dict)
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

    def field_typed(self, key: str, value: str) -> None:
        """Typed field setter: classify the raw value into
        string / int / bool / float exactly as the JVM column parser
        does (``sources/lineprotocol.py::parse_lines_typed_df``) —
        this method IS the semantic spec the equivalence fuzz pins."""
        if key == "" or value == "":
            return  # protocol.rs:40-44 — empty key/value skipped
        if value.startswith('"') or '"' in value:
            if not _STRING_RE.match(value):
                raise ParseError(f"bad string field value {value!r} for key {key!r}")
            body = value[1:-1]
            self.field_set[key] = re.sub(r"\\(.)", r"\1", body)
            return
        if _INT_RE.match(value):
            iv = int(value[:-1])
            # the JVM side try_casts to BIGINT (null on overflow -> DLQ)
            if not (_I64_MIN <= iv <= _I64_MAX):
                raise ParseError(f"integer field value out of i64 range: {value!r}")
            self.field_set[key] = iv
            return
        if value in _TRUE_LITERALS:
            self.field_set[key] = True
            return
        if value in _FALSE_LITERALS:
            self.field_set[key] = False
            return
        self.field(key, value)

    @classmethod
    def parse(cls, line: str, typed: bool = False) -> "LineProtocol":
        """Parse one line. Mirrors ``protocol.rs:78-147``:
        whitespace-split into [measurement+tags, fieldset, timestamp];
        comma-split each; ``=``-split pairs; timestamp REQUIRED
        (``protocol.rs:142-144``).

        ``typed=True`` parses the reference's DECLARED value surface
        (``README.md:49``): ``42i`` integers, ``true``/``false``
        booleans, and double-quoted strings with ``\\"``/``\\\\``
        escapes — quoted values may contain spaces and commas, so the
        typed grammar tokenizes quote-aware. Stricter than the default
        grammar in one deliberate way: tokens past the timestamp are a
        parse error (the untyped tokenizer silently ignored them),
        keeping the Python spec aligned with the anchored JVM regex.
        """
        if typed:
            tokens = _split_outside_quotes(line, " \t\n\r\x0b\x0c")
            if len(tokens) > 3:
                raise ParseError("trailing garbage after timestamp")
        else:
            tokens = line.split()
        if not tokens:
            raise ParseError("empty line")  # protocol.rs:79-81

        lp = cls(measurement_name="")

        # token 0: measurement[,k=v...]   (protocol.rs:87-107)
        head = tokens[0].split(",")
        lp.measurement_name = head[0]
        if lp.measurement_name == "":
            raise ParseError("empty measurement name")
        if typed and '"' in tokens[0]:
            raise ParseError("quote in measurement/tag section")
        for pair in head[1:]:
            k, sep, v = pair.partition("=")
            if sep:
                lp.tag(k, v)

        # token 1: fieldset  (protocol.rs:109-128; required)
        if len(tokens) < 2:
            raise ParseError("missing fieldset")  # protocol.rs:125-127
        pairs = (
            _split_outside_quotes(tokens[1], ",") if typed
            else tokens[1].split(",")
        )
        for pair in pairs:
            k, sep, v = pair.partition("=")
            if sep:
                if typed:
                    if '"' in k:
                        raise ParseError(f"quote in field key {k!r}")
                    lp.field_typed(k, v)
                else:
                    lp.field(k, v)
            elif typed:
                # a segment with no '=' at all — including the EMPTY
                # segment a leading/trailing/double comma produces —
                # is malformed under the JVM grammar's tiling check
                raise ParseError(f"bad fieldset segment {pair!r}")
        if not lp.field_set:
            raise ParseError("missing fieldset")

        # token 2: timestamp — REQUIRED (protocol.rs:142-144)
        if len(tokens) < 3:
            raise ParseError("missing timestamp")
        ts_tok = tokens[2]
        if typed and ('"' in ts_tok):
            raise ParseError(f"bad timestamp {ts_tok!r}")
        try:
            lp.timestamp = int(ts_tok)
        except ValueError as exc:
            raise ParseError(f"bad timestamp {ts_tok!r}") from exc
        return lp

    def serialize(self) -> str:
        """Canonical line (echo mode). Mirrors ``protocol.rs:46-72``.
        Typed values print in their wire form — ``42i``, ``true``,
        ``"quoted\\" string"`` — so the reference's own four unit-test
        lines (``protocol.rs:155,164,173,183``) round-trip verbatim."""
        out = self.measurement_name
        for k, v in self.tag_set.items():
            out += f",{k}={v}"
        out += " " + ",".join(f"{k}={_fmt_value(v)}" for k, v in self.field_set.items())
        out += f" {self.timestamp}"
        return out


def _fmt_float(v: float) -> str:
    # Match Rust's Display for f64 closely enough for round-trip tests:
    # integral values print without trailing .0? Rust prints 42 as "42".
    if v == int(v):
        return str(int(v))
    return repr(v)


def _fmt_value(v: "float | int | bool | str") -> str:
    """Wire form of a (possibly typed) field value. bool checked before
    int — Python bools ARE ints."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"{v}i"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return _fmt_float(v)
