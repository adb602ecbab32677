"""Error taxonomy mirroring the reference's observable errors.

The reference maps failures to strings at ``persistence.rs:198-220``
(query execute errors), ``persistence.rs:147-162`` (validator), and
``utils/db.rs:15-17`` ("No data found for query"). We keep the same
*categories* as typed exceptions so the HTTP layer (or a test) can map
them to the same status codes (400/404).
"""

from __future__ import annotations


class RefluxError(Exception):
    """Base class for engine errors."""


class ValidationError(RefluxError):
    """Query rejected by the gateway validator.

    Reference: mutation blocklist ``persistence.rs:147-153`` and the
    SELECT-only/single-statement checks ``utils/db.rs:110-132``.
    """


class TableNotFoundError(RefluxError):
    """Unknown timeseries. Reference: ``persistence.rs:205-216`` maps
    GlueSQL Fetch/Execute TableNotFound errors to "table not found"
    (and quirk Q12: an unregistered-but-valid name panics — we never do).
    """


class NoDataError(RefluxError):
    """Empty result in strict-compat mode.

    Reference quirk Q5: ``utils/db.rs:15-17`` errors with "No data found
    for query" on 0 rows; default mode returns an empty list instead.
    """


class ParseError(RefluxError):
    """Malformed line-protocol input.

    Reference: ``protocol.rs:79-81`` (empty line), ``protocol.rs:142-144``
    (missing timestamp), ``protocol.rs:125-127`` (missing fieldset).
    Non-numeric field values panic the reference (``protocol.rs:42``);
    we reject the row instead (quirk Q6).
    """
