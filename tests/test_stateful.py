"""Stateful streaming EMA: state must carry across micro-batches AND
across query restarts (checkpoint recovery), matching a driver-side
EMA fold over the full, ordered input."""

import time

from refluxdb_spark.streaming.stateful import stream_ema

ALPHA = 0.3


def _run_once(spark, lines_dir, ckpt, out_dir):
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema("series string, ts long, value double")
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .json(str(lines_dir))
    )
    out = stream_ema(src, alpha=ALPHA)

    def _sink(batch_df, batch_id):
        # memory sink can't recover from checkpoints; parquet via
        # foreachBatch can
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        out.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(str(out_dir)).collect()
    # update mode emits the latest value per key per batch; the row with
    # the highest n_obs per key is the final state
    final = {}
    for r in sorted(rows, key=lambda r: r.n_obs):
        final[r.series] = (r.ema, r.n_obs)
    return final


def _expected_ema(values):
    ema = None
    for v in values:
        ema = v if ema is None else ALPHA * v + (1 - ALPHA) * ema
    return ema


def test_ema_state_across_batches_and_restart(spark, tmp_path):
    lines_dir = tmp_path / "ema_in"
    lines_dir.mkdir()
    ckpt = tmp_path / "ema_ck"

    (lines_dir / "b1.json").write_text(
        '{"series":"cpu","ts":1,"value":10.0}\n'
        '{"series":"cpu","ts":2,"value":20.0}\n'
        '{"series":"mem","ts":1,"value":5.0}\n'
    )
    time.sleep(0.01)
    (lines_dir / "b2.json").write_text('{"series":"cpu","ts":3,"value":30.0}\n')

    final = _run_once(spark, lines_dir, ckpt, tmp_path / "ema_out")
    assert final["cpu"][1] == 3
    assert final["cpu"][0] == _expected_ema([10.0, 20.0, 30.0])
    assert final["mem"] == (5.0, 1)

    # restart with a NEW file — state must resume from the checkpoint,
    # not refold the old rows
    (lines_dir / "b3.json").write_text('{"series":"cpu","ts":4,"value":40.0}\n')
    final2 = _run_once(spark, lines_dir, ckpt, tmp_path / "ema_out2")
    assert final2["cpu"][1] == 4
    assert final2["cpu"][0] == _expected_ema([10.0, 20.0, 30.0, 40.0])


def test_ema_multichunk_group_folds_in_order(spark, tmp_path):
    """A group larger than the Arrow batch size arrives as MULTIPLE
    chunks whose relative order is not guaranteed — the update fn must
    concat before sorting (a per-chunk sort would fold out of
    event-time order). Forces 50-row chunks against a 400-row group."""
    import json

    lines_dir = tmp_path / "ema_chunk_in"
    lines_dir.mkdir()
    n = 400
    # values chosen so any out-of-order fold produces a different float
    vals = [((i * 37) % 101) / 7.0 for i in range(n)]
    with open(lines_dir / "b1.json", "w") as f:
        for i, v in enumerate(vals):
            f.write(json.dumps({"series": "cpu", "ts": i, "value": v}) + "\n")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        final = _run_once(
            spark, lines_dir, tmp_path / "ema_chunk_ck", tmp_path / "ema_chunk_out"
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert final["cpu"][1] == n
    assert final["cpu"][0] == _expected_ema(vals)


def test_counter_total_update_fn_by_hand():
    """Reset-aware totalizer: increases accumulate as deltas, a
    backward step counts the new value whole and bumps n_resets;
    integer-cent accumulation is exact."""
    import pandas as pd

    from refluxdb_spark.streaming.stateful import counter_total_update_fn

    class FakeState:
        exists = False
        updated = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True
            self.updated = v

    fn = counter_total_update_fn(order_cols=("ts",))
    st = FakeState()
    # 10.00 -> 10.50 (+0.50) -> 2.25 (reset, +2.25) -> 2.75 (+0.50)
    pdf = pd.DataFrame(
        {"ts": [1, 2, 3, 4], "value": [10.00, 10.50, 2.25, 2.75]}
    )
    out = list(fn(("s",), iter([pdf]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row.total == 13.25 and row.n_obs == 4 and row.n_resets == 1
    # second batch resumes from state: 2.75 -> 3.00 (+0.25)
    out2 = list(fn(("s",), iter([pd.DataFrame({"ts": [5], "value": [3.00]})]), st))
    row2 = out2[0].iloc[0]
    assert row2.total == 13.50 and row2.n_obs == 5 and row2.n_resets == 1


def test_liveness_update_fn_by_hand():
    """Registry state folds max/count across chunk boundaries."""
    import pandas as pd

    from refluxdb_spark.streaming.stateful import liveness_update_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    st = FakeState()
    fn = liveness_update_fn()
    out1 = list(fn((7,), iter([pd.DataFrame({"_us": [100, 300]})]), st))
    assert st.get == (300, 2)
    out2 = list(fn((7,), iter([pd.DataFrame({"_us": [250]}), pd.DataFrame({"_us": [900]})]), st))
    assert st.get == (900, 4)
    assert out2[0].iloc[0]["last_seen_us"] == 900
    assert out1[0].iloc[0]["n_obs"] == 2


def test_zscore_update_fn_by_hand():
    """Running-baseline z-score: each value scored against PRIOR
    moments only; warm-up suppresses early alerts; state carries
    integer moments across batches."""
    import math

    import pandas as pd

    from refluxdb_spark.streaming.stateful import zscore_update_fn

    class FakeState:
        exists = False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = zscore_update_fn(z_threshold=3.0, min_prior=4, order_cols=("ts", "_tie"))
    st = FakeState()
    # warm-up: 4 identical values (var 0 -> never alerts), then a spike
    pdf = pd.DataFrame(
        {
            "ts": [1, 2, 3, 4, 5],
            "_tie": [1, 2, 3, 4, 5],
            "value": [1.0, 1.0, 1.0, 1.0, 50.0],
        }
    )
    out = list(fn(("s",), iter([pdf]), st))
    # var of prior==0 for row 5 -> no alert, but state now holds it
    assert out == []
    assert st.get == (5, 5400, 25040000)  # n, Σcents, Σcents²
    # second batch: 1.0 against mean 10.8, std from integer moments
    out2 = list(
        fn(("s",), iter([pd.DataFrame({"ts": [6], "_tie": [6], "value": [1.0]})]), st)
    )
    n, s, s2 = 5, 5400, 25040000
    mean = s / n
    var = s2 / n - mean * mean
    z = (100 - mean) / math.sqrt(var)
    if abs(z) > 3.0:
        assert len(out2) == 1 and out2[0].iloc[0].z == z
    else:
        assert out2 == []


def test_importance_sample_extremes(spark):
    from refluxdb_spark.operators.sampling import importance_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 0.0), (4, 0.0)], "doc_id int, score double"
    )
    got = {r["doc_id"]: r["kept"] for r in importance_sample(df, "score", "doc_id").collect()}
    # score 1.0 -> threshold 2^32 > any 32-bit hash; score 0 -> threshold 0
    assert got[1] and got[2] and not got[3] and not got[4]


def test_state_store_provider_is_rocksdb(spark, tmp_path):
    """The session default must route stateful streaming through the
    RocksDB state store (VERDICT r17 item 1: heap-backed state is the
    first streaming OOM at real key cardinality) — asserted from the
    query's own progress metrics, not just the conf: the RocksDB
    provider publishes rocksdb* custom metrics per state operator,
    the HDFS-backed one publishes none."""
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )
    lines_dir = tmp_path / "rk_in"
    lines_dir.mkdir()
    (lines_dir / "b.json").write_text(
        '{"series":"cpu","ts":1,"value":10.0}\n'
        '{"series":"mem","ts":1,"value":5.0}\n'
    )
    src = spark.readStream.schema("series string, ts long, value double").json(
        str(lines_dir)
    )
    out = stream_ema(src, alpha=ALPHA)
    q = (
        out.writeStream.format("memory")
        .queryName("rk_probe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "rk_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    ops = progress["stateOperators"]
    assert ops, "stateful query reported no state operators"
    custom = ops[0].get("customMetrics", {})
    rocks_keys = [k for k in custom if k.lower().startswith("rocksdb")]
    assert rocks_keys, f"no rocksdb metrics in {sorted(custom)}"
