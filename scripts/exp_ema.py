"""Experiment (VERDICT r5 item 6): can pandas ewm(adjust=False) replace
the plain-loop EMA walk without losing bit-exactness vs the recursive-
CTE oracle?

Measured at sf0.1 (2026-08-14, local[32]):
- bit-exactness: 0 of the per-user groups mismatch, BUT only because
  the corpus has no consecutive exactly-equal (prev_ema == value)
  steps: pandas' ewma kernel skips the update when weighted_avg == cur
  (pandas/_libs/window/aggregations.pyx), so a constant-valued run
  yields v where the oracle's fl(0.2*v + 0.8*v) can differ by 1 ulp.
  Bit-exact on THIS data by luck, not structurally.
- speed: loop 5.16 s, ewm 4.28 s median-of-3 — BOTH far above the
  2.5 s target, so the floor is the key shuffle + Arrow group overhead,
  not the Python multiply-adds.

Decision: keep the plain loop (guaranteed oracle parity); the 0.9 s
ewm gain neither meets the target nor survives adversarial data.

Usage: python scripts/exp_ema.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import refluxdb_spark.operators.timeseries as TS  # noqa: E402
from refluxdb_spark.queries import load  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_ema")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    e.count()

    a, b = 0.2, 1.0 - 0.2
    pdf = e.toPandas().sort_values(["user_id", "ts", "event_id"])
    mism = eqcase = 0
    for _, g in pdf.groupby("user_id"):
        vals = g["value"].to_numpy().tolist()
        acc = []
        if vals:
            ev = vals[0]
            acc.append(ev)
            for v in vals[1:]:
                if ev == v:
                    eqcase += 1
                ev = a * v + b * ev
                acc.append(ev)
        ewm = g["value"].ewm(alpha=a, adjust=False).mean().to_numpy()
        if not np.array_equal(np.array(acc), ewm):
            mism += 1
    print(f"groups bit-mismatching ewm: {mism}; equal-step guard hits: {eqcase}")

    def run(mk, reps=3):
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            mk().count()
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    cur = run(
        lambda: TS.ema(
            e, ts_col="ts", value_col="value", by=["user_id"],
            alpha=0.2, tiebreak="event_id",
        )
    )

    def ema_ewm(df):
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + ", `ema` double"
        keep = df.columns

        def walk(p):
            p = p.sort_values(["ts", "event_id"], kind="mergesort")
            p["ema"] = p["value"].ewm(alpha=0.2, adjust=False).mean()
            return p[keep + ["ema"]]

        return df.groupBy("user_id").applyInPandas(walk, schema=schema)

    new = run(lambda: ema_ewm(e))
    print(f"plain loop: {cur:.2f}s  ewm: {new:.2f}s")


if __name__ == "__main__":
    main()
