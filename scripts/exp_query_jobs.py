"""Per-query wall/CPU/job-count probe for targeted A/B measurement.

Usage: python scripts/exp_query_jobs.py [--reps N] <query> [query ...]

For each named query: runs it to completion ``reps`` times
(clearCache + count, the bench methodology) and reports the median
wall, the executor-CPU per rep, and the number of Spark JOBS one
execution launches (scraped from the UI REST API) — the driver-
round-trip count that the wall bench can only show indirectly
through scheduler stalls. Job count is deterministic for a fixed
plan, so it is the honest axis for "fewer driver syncs" claims.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refluxdb_spark.queries import QUERIES  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402


def _ui(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="exp_query_jobs",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from refluxdb_spark.queries import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()
    out = {}
    for name in args:
        fn = QUERIES[name]
        samples = []
        jobs_per_run = []
        cpu_per_run = []
        for _ in range(reps):
            spark.catalog.clearCache()
            j0 = len(_ui(spark, "jobs"))
            s0 = {(s["stageId"], s["attemptId"]) for s in _ui(spark, "stages")}
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
            time.sleep(0.3)
            jobs_per_run.append(len(_ui(spark, "jobs")) - j0)
            cpu = sum(
                s.get("executorCpuTime", 0)
                for s in _ui(spark, "stages")
                if (s["stageId"], s["attemptId"]) not in s0
            )
            cpu_per_run.append(round(cpu / 1e9, 3))
        samples.sort()
        out[name] = {
            "wall_median": round(samples[len(samples) // 2], 3),
            "wall": [round(s, 3) for s in samples],
            "jobs": jobs_per_run,
            "cpu": cpu_per_run,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
