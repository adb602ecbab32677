"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful stream processing at all (SURVEY §2.3);
this is the extension point for per-series running statistics that
tumbling windows can't express — here an exponential moving average
(EMA), the classic "current smoothed value per series" gauge.

Why applyInPandasWithState: the state (one float per series) must
survive across micro-batches and restarts; Arrow batches keep the
Python hop amortized; grouping gives per-key state isolation and
scales by key partitioning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("ema", DoubleType()),
        StructField("n_obs", LongType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [StructField("ema", DoubleType()), StructField("n_obs", LongType())]
)


def ema_update_fn(alpha: float, order_cols: tuple[str, ...] = ("ts",)):
    """Build the per-group state update function: rows of one series in
    one micro-batch -> updated (ema, n_obs). Rows are EMA-folded in
    ``order_cols`` order; state carries the running value between
    batches (and across restarts via the checkpoint).

    The group's Arrow chunks are concatenated BEFORE the sort: a large
    group arrives as multiple ~10k-row chunks whose relative order is
    not guaranteed, so per-chunk sorting would fold out of event-time
    order. Pass a unique tiebreak in ``order_cols`` when timestamps
    can collide — ties under an unstable sort are layout-dependent."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ema, n_obs = state.get
        else:
            ema, n_obs = None, 0
        chunks = list(pdfs)
        if not chunks:
            # a timed-out key (if GroupStateTimeout is ever enabled) is
            # invoked with no data — keep state, emit nothing
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        for v in pdf.sort_values(list(order_cols))["value"]:
            v = float(v)
            ema = v if ema is None else alpha * v + (1.0 - alpha) * ema
            n_obs += 1
        state.update((ema, n_obs))
        yield pd.DataFrame([{"series": key[0], "ema": ema, "n_obs": n_obs}])

    return update


def stream_ema(
    source: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming per-series EMA: emits one updated (series, ema, n_obs)
    row per series per micro-batch. Caller attaches the writeStream
    sink (update output mode). ``tiebreak_col`` (a unique column)
    pins the fold order when event times can collide."""
    from pyspark.sql import functions as F

    cols = [
        F.col(series_col).alias("series"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ]
    order: tuple[str, ...] = ("ts",)
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col).alias("_tie"))
        order = ("ts", "_tie")
    keyed = source.select(*cols).groupBy("series")
    return keyed.applyInPandasWithState(
        ema_update_fn(alpha, order),
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("total", DoubleType()),
        StructField("n_obs", LongType()),
        StructField("n_resets", LongType()),
    ]
)

COUNTER_STATE_SCHEMA = StructType(
    [
        StructField("last_cents", LongType()),
        StructField("total_cents", LongType()),
        StructField("n_obs", LongType()),
        StructField("n_resets", LongType()),
    ]
)


def counter_total_update_fn(order_cols: tuple[str, ...] = ("ts",)):
    """Per-series monotonic-counter totalizer with reset detection —
    the Prometheus `increase()` semantics as persistent stream state:
    each observation adds (v - last) when the counter moved forward,
    or v (a restart zeroed it) when it went backward.

    Accumulation is in INTEGER CENTS (inputs are 2-decimal gauges):
    float running sums drift with fold order, integer cents are exact
    and match an order-free DECIMAL-routed batch oracle bit-for-bit.
    Chunks are concatenated before the event-time sort (same contract
    as ``ema_update_fn``)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_c, total_c, n_obs, n_resets = state.get
        else:
            last_c, total_c, n_obs, n_resets = None, 0, 0, 0
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        for v in pdf.sort_values(list(order_cols))["value"]:
            cents = int(round(float(v) * 100))
            if last_c is None or cents < last_c:
                total_c += cents
                if last_c is not None:
                    n_resets += 1
            else:
                total_c += cents - last_c
            last_c = cents
            n_obs += 1
        state.update((last_c, total_c, n_obs, n_resets))
        yield pd.DataFrame(
            [
                {
                    "series": key[0],
                    "total": total_c / 100.0,
                    "n_obs": n_obs,
                    "n_resets": n_resets,
                }
            ]
        )

    return update


def stream_counter_total(
    source: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming reset-aware counter totals: emits one updated
    (series, total, n_obs, n_resets) row per series per micro-batch —
    the running `increase()` gauge a TSDB serves for monotonic
    counters. Caller attaches the writeStream sink (update mode)."""
    from pyspark.sql import functions as F

    cols = [
        F.col(series_col).alias("series"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ]
    order: tuple[str, ...] = ("ts",)
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col).alias("_tie"))
        order = ("ts", "_tie")
    keyed = source.select(*cols).groupBy("series")
    return keyed.applyInPandasWithState(
        counter_total_update_fn(order),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LIVENESS_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("last_seen_us", LongType()),
        StructField("n_obs", LongType()),
    ]
)
LIVENESS_STATE_SCHEMA = StructType(
    [
        StructField("last_seen_us", LongType()),
        StructField("n_obs", LongType()),
    ]
)


def liveness_update_fn():
    """Per-sender liveness registry: persistent (last_seen, n_obs)
    state updated by event-time max — the device-registry state behind
    heartbeat/down-detection (the streaming twin of
    ``timeseries.heartbeat_uptime``'s batch view). Max/count are
    order-insensitive, so the emitted state equals the batch oracle
    regardless of micro-batch boundaries."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, n_obs = state.get
        else:
            last_us, n_obs = None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            mx = int(pdf["_us"].max())
            if last_us is None or mx > last_us:
                last_us = mx
            n_obs += len(pdf)
        if last_us is None:
            return
        state.update((last_us, n_obs))
        yield pd.DataFrame(
            [{"key": key[0], "last_seen_us": last_us, "n_obs": n_obs}]
        )

    return update


def stream_liveness(
    source: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming last-seen registry: one updated (key, last_seen_us,
    n_obs) row per sender per micro-batch. Liveness itself ("alive =
    seen within the horizon") is a comparison against the clock at
    READ time, so it stays out of the state — the registry is the
    durable part. Caller attaches the sink (update mode)."""
    from pyspark.sql import functions as F

    keyed = (
        source.select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col)).alias("_us"),
        )
        .groupBy("key")
    )
    return keyed.applyInPandasWithState(
        liveness_update_fn(),
        outputStructType=LIVENESS_OUTPUT_SCHEMA,
        stateStructType=LIVENESS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ZSCORE_OUTPUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
        StructField("n_prior", LongType()),
    ]
)

ZSCORE_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sum_cents", LongType()),
        StructField("sumsq_cents", LongType()),
    ]
)


def zscore_update_fn(
    z_threshold: float = 3.0,
    min_prior: int = 30,
    order_cols: tuple[str, ...] = ("ts", "_tie"),
):
    """Streaming anomaly detector state: per-series prefix moments
    (n, Σcents, Σcents²) as INTEGERS, each arriving value scored
    against the moments of all PRIOR values — the running-baseline
    z-score a monitoring pipeline raises alerts from.

    Integer state is what makes the full value oracle possible: the
    batch twin computes the identical prefix sums with a cumulative
    window frame (rows unbounded preceding → 1 preceding), and the
    per-row score is one fixed-order double expression on both sides
    (mean = sum/n; var = sumsq/n − mean²; z = (x − mean)/√var — IEEE
    ops on identical operands, bit-exact everywhere). Sums of cents²
    stay in BIGINT: overflow at ~9·10¹⁸ ≈ 10⁹ observations/series at
    full-scale values — shard the series key before that.

    Emits only anomalies (|z| > threshold after ``min_prior``
    warm-up, positive variance). Batches are folded in
    ``order_cols`` event-time order; cross-batch correctness relies on
    the source replaying in time order (same contract as the EMA and
    counter folds)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, s2 = state.get
        else:
            n, s, s2 = 0, 0, 0
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        rows = []
        for _, r in pdf.sort_values(list(order_cols)).iterrows():
            cents = int(round(float(r["value"]) * 100))
            if n >= min_prior:
                mean = s / n
                var = s2 / n - mean * mean
                if var > 0.0:
                    z = (cents - mean) / math.sqrt(var)
                    if abs(z) > z_threshold:
                        rows.append(
                            {
                                "series": key[0],
                                "event_id": int(r["_tie"]),
                                "value": float(r["value"]),
                                "z": z,
                                "n_prior": n,
                            }
                        )
            n += 1
            s += cents
            s2 += cents * cents
        state.update((n, s, s2))
        if rows:
            yield pd.DataFrame(rows)

    return update


def stream_zscore(
    source: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    z_threshold: float = 3.0,
    min_prior: int = 30,
) -> DataFrame:
    """Streaming running-baseline z-score anomalies: emits one row per
    anomalous event (append semantics). Caller attaches the
    writeStream sink."""
    from pyspark.sql import functions as F

    keyed = source.select(
        F.col(series_col).alias("series"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        F.col(tiebreak_col).alias("_tie"),
    ).groupBy("series")
    return keyed.applyInPandasWithState(
        zscore_update_fn(z_threshold, min_prior),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
