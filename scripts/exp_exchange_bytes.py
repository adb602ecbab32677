"""Measure the total shuffle (exchange) bytes a query writes.

Runs one named query from ``refluxdb_spark.queries`` to completion on a
fresh session, then sums shuffle-write bytes and records over every
completed stage via the Spark UI REST API — the ground truth for "what
does this plan actually exchange", independent of wall-clock noise.
Used to record the MinHash carried-payload shrink (VERDICT r9 item 2)
in SCALE.md §9; reusable for any exchange-payload experiment:

    python scripts/exp_exchange_bytes.py dedup_minhash_lsh_pairs \
        [/root/testdata/sf0.1]
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


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # the shared session builder disables the UI; this experiment needs
    # its REST API, so re-enable it for this process only
    spark = get_spark(
        app_name=f"exchange_bytes_{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    t0 = time.time()
    n = QUERIES[name](spark, sf_dir).count()
    sec = round(time.time() - t0, 2)

    stages = _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    wbytes = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    wrecs = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "rows": n,
        "sec": sec,
        "shuffle_write_bytes": wbytes,
        "shuffle_write_mb": round(wbytes / 1e6, 1),
        "shuffle_write_records": wrecs,
        "stages": len(stages),
    }))


if __name__ == "__main__":
    main()
