"""Capture ``explain("formatted")`` for named queries into plan files.

Usage: python scripts/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query — the
before/after plan evidence an optimization round commits (the judge
cannot run Spark; these files are what plan claims are checked
against). Building a query's DataFrame executes any operator-internal
materialization (checkpointed loop rounds), so captures run at the
bench scale factor to reflect the bench's plan shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refluxdb_spark.queries import QUERIES  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    unknown = sorted(set(names) - set(QUERIES))
    if unknown:
        print(f"error: unknown queries: {unknown}", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(plan)
        print(f"[plan] {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
