"""Tier-9 scaling leg: streaming STATE vs KEY CARDINALITY (not row
volume) — the axis the RocksDB state-store default exists for
(VERDICT r17 item 1).

Every other scaling leg in SCALE.md grows DATA with key counts along
for the ride; the stateful streaming family's failure mode is
different: `applyInPandasWithState` state is per-KEY, so the thing
that breaks first at 100 TB is millions of series/senders, not
millions of rows. This experiment holds total row volume FIXED and
grows the distinct-key count x10 / x100, running the same stateful
EMA (`streaming.stateful.stream_ema`, 2 scalars of state per key)
under BOTH providers:

- HDFSBackedStateStoreProvider (Spark's default): every key's state
  lives deserialized in executor heap — `memoryUsedBytes` on the
  state operator IS heap, and must grow ~linearly with keys.
- RocksDBStateStoreProvider (this repo's default, session.py): state
  lives in native RocksDB (memtable + block cache + SST files on
  local disk) — `memoryUsedBytes` reports the bounded native
  working set, and the key-linear growth moves to
  `rocksdbSstFileSize` (disk), which is the architecture the
  default buys: per-executor memory O(cache), not O(keys).

Usage:
    python scripts/exp_state_cardinality.py [key_counts...]
                                            (default 1000 10000 100000)
Env: SPARK_GRAFT_STATE_ROWS total input rows (default 500000).

Prints a markdown table for SCALE.md §12. Wall times here include the
Python stateful fold (one pandas call per key per batch) — the
measured quantity is the STATE metrics, not throughput.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refluxdb_spark.session import get_spark  # noqa: E402
from refluxdb_spark.streaming.stateful import stream_ema  # noqa: E402

WORK = "/tmp/refluxdb_spark_state_cardinality"

PROVIDERS = {
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
}


def build_input(spark, keys: int, rows: int) -> str:
    """Fixed row volume, ``keys`` distinct series: series = s<id mod
    keys>, one monotone ts per series so the EMA fold is deterministic."""
    out = f"{WORK}/in_k{keys}_r{rows}"
    if not os.path.exists(f"{out}/_SUCCESS"):
        shutil.rmtree(out, ignore_errors=True)
        (
            spark.range(rows)
            .selectExpr(
                f"concat('s', id % {keys}) as series",
                f"id div {keys} as ts",
                "cast(id % 1000 as double) / 10.0 as value",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def run_once(spark, provider_class: str, in_dir: str, tag: str) -> dict:
    """One availableNow pass of the stateful EMA over ``in_dir`` with
    the given provider; returns the state-operator metrics."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", provider_class
    )
    ck = f"{WORK}/ck_{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    src = spark.readStream.schema(
        "series string, ts long, value double"
    ).parquet(in_dir)
    out = stream_ema(src)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sec = round(time.time() - t0, 1)
    op = q.lastProgress["stateOperators"][0]
    custom = op.get("customMetrics", {})
    return {
        "keys": op["numRowsTotal"],
        "memory_used_bytes": op.get("memoryUsedBytes"),
        "sst_file_bytes": custom.get("rocksdbSstFileSize"),
        "sec": sec,
    }


def main() -> int:
    args = sys.argv[1:]
    try:
        key_counts = [int(a) for a in args] or [1000, 10000, 100000]
    except ValueError as e:
        print(f"error: key counts must be integers ({e})", file=sys.stderr)
        return 2
    if any(k < 1 for k in key_counts):
        print(f"error: key counts must be >= 1, got {key_counts}",
              file=sys.stderr)
        return 2
    rows = int(os.environ.get("SPARK_GRAFT_STATE_ROWS", "500000"))
    spark = get_spark(app_name="state_cardinality")
    spark.sparkContext.setLogLevel("ERROR")
    results: list[tuple[str, int, dict]] = []
    for keys in key_counts:
        in_dir = build_input(spark, keys, rows)
        for pname, pclass in PROVIDERS.items():
            rec = run_once(spark, pclass, in_dir, f"{pname}_{keys}")
            results.append((pname, keys, rec))
            print(f"# {pname} keys={keys}: {json.dumps(rec)}",
                  file=sys.stderr)
    base_mem: dict[str, int] = {}
    print("| provider | keys | rows | state rows | memoryUsedBytes |"
          " mem growth | sst (disk) | wall |")
    print("|---|---|---|---|---|---|---|---|")
    for pname, keys, rec in results:
        mem = rec["memory_used_bytes"] or 0
        if pname not in base_mem and mem:
            base_mem[pname] = mem
        growth = (
            f"{mem / base_mem[pname]:.1f}x" if base_mem.get(pname) else "-"
        )
        sst = rec["sst_file_bytes"]
        sst_s = f"{int(sst) / 1e6:.2f} MB" if sst else "-"
        print(
            f"| {pname} | {keys} | {rows} | {rec['keys']} | "
            f"{mem / 1e6:.2f} MB | {growth} | {sst_s} | {rec['sec']}s |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
