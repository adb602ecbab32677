"""Experiment: do the operator-internal persist() calls actually beat
Spark's own exchange reuse? Times each affected headline query at the
bench sf with persist live vs patched to a no-op, and reports whether
ReusedExchange appears in the no-persist plan.

Usage: python scripts/exp_persist.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

from refluxdb_spark.queries import QUERIES, TABLES, load  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402

AFFECTED = [
    "dedup_jaccard_pairs_capped",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs_capped",
    "sim_rp_lsh_pairs",
]


def run(spark, sf_dir, name, reps=3):
    samples = []
    n = 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        samples.append(time.time() - t0)
    samples.sort()
    return samples[len(samples) // 2], n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_persist")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load(spark, sf_dir, t).count()

    for name in AFFECTED:
        with_p, n1 = run(spark, sf_dir, name)
        with mock.patch.object(DataFrame, "persist", lambda self, *a, **k: self):
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            reused = plan.count("ReusedExchange")
            no_p, n2 = run(spark, sf_dir, name)
        assert n1 == n2, (name, n1, n2)
        print(
            f"{name}: persist={with_p:.2f}s nopersist={no_p:.2f}s "
            f"reused_exchanges={reused} rows={n1}"
        )


if __name__ == "__main__":
    main()
