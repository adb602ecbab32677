"""Per-STAGE breakdown of one query execution — the serial-stage finder.

Usage: python scripts/exp_stage_profile.py <query> [query ...]

Runs each named query once (count, the bench methodology) and prints
every Spark stage the execution launched: task count, executor run/CPU
time, shuffle read/write bytes, and the first line of the stage name.
The signature this probe exists to catch: a stage with numTasks=1 and
multi-second CPU — a single-row-group parquet scan executing the whole
pre-exchange expression chain serially while every other core idles
(guide §2.5; see operators.skew.spread_input).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refluxdb_spark.queries import QUERIES  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402


def _ui(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="exp_stage_profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4098"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from refluxdb_spark.queries import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()
    for name in names:
        spark.catalog.clearCache()
        s0 = {(s["stageId"], s["attemptId"]) for s in _ui(spark, "stages")}
        QUERIES[name](spark, sf_dir).count()
        new = [
            s
            for s in _ui(spark, "stages")
            if (s["stageId"], s["attemptId"]) not in s0
        ]
        new.sort(key=lambda s: s["stageId"])
        print(f"== {name}: {len(new)} stages")
        tot_cpu = 0.0
        for s in new:
            cpu = s.get("executorCpuTime", 0) / 1e9
            run = s.get("executorRunTime", 0) / 1e3
            tot_cpu += cpu
            nm = (s.get("name") or "").split("\n")[0][:70]
            print(
                f"  stage {s['stageId']:>4} tasks={s['numTasks']:>3} "
                f"cpu={cpu:7.2f}s run={run:7.2f}s "
                f"shr={s.get('shuffleReadBytes', 0):>10} "
                f"shw={s.get('shuffleWriteBytes', 0):>10}  {nm}"
            )
        print(f"  total cpu {tot_cpu:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
