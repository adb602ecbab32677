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
