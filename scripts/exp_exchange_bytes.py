"""Measure the total shuffle (exchange) bytes queries write.

Runs named queries from ``refluxdb_spark.queries`` to completion and
sums shuffle-write bytes and records over the stages each query ran,
via the Spark UI REST API — the ground truth for "what does this plan
actually exchange", independent of wall-clock noise (same-code bench
totals at sf0.1 spread ±7% run to run; shuffle BYTES are stable to
<1%, records exactly). Three modes:

Single query (round-10 shape, one fresh session per invocation):

    python scripts/exp_exchange_bytes.py dedup_minhash_lsh_pairs \
        [/root/testdata/sf0.1]

Record a baseline for a query set (ONE session; per-query attribution
by diffing the completed-stage set around each run):

    python scripts/exp_exchange_bytes.py --baseline OUT.json \
        [--sf /root/testdata/sf0.1] [name ...]   # default: BASELINE_SET

Re-measure a baseline's queries and fail on byte growth — the
deterministic complement to the wall-clock ratchet (VERDICT r10
item 2). Exit 1 if any query's bytes exceed threshold x baseline
(with a 64 KiB absolute floor so tiny exchanges can't flag on jitter):

    python scripts/exp_exchange_bytes.py --check BASELINE.json \
        [--sf DIR] [--threshold 1.2] [--out remeasured.json]

For artifact-vs-artifact byte diffs without re-measuring, see
``scripts/bench_compare.py --bytes``.
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

#: The exchange-bytes ratchet set: the top-20 most expensive headline
#: queries by the round-10 bench artifact (BENCH_r10.json), plus the
#: two sub-second queries the r9→r10 wall-clock compare flagged as
#: variance-suspect (so future adjudication of either is byte-based,
#: VERDICT r10 item 3), plus sim_rp_lsh_pairs carried over from the
#: round-10 8-query baseline for continuity. Order = r10 cost rank.
BASELINE_SET = [
    "dedup_simhash_pairs_capped",
    "sim_ivfpq_topk",
    "dedup_semantic_prune",
    "dedup_minhash_lsh_pairs",
    "dedup_components",
    "string_fuzzy_title_pairs",
    "dedup_source_overlap",
    "pipeline_corpus_end_to_end",
    "dedup_incremental_pairs",
    "sim_pq_adc_topk",
    "sim_ivf_quantized_topk",
    "sim_ivf_topk",
    "dedup_jaccard_pairs_capped",
    "orders_open_backlog_daily",
    "text_boilerplate_removal",
    "dedup_decontaminate",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q3_shipping_priority",
    "sim_centroid_classify",
    # variance-suspect sub-second flags (r9→r10)
    "events_bot_signals",
    # round-10 baseline carry-over
    "sim_rp_lsh_pairs",
    # round-11 join-filter-below-aggregate rewrites (with tpch_q2
    # above): pinned so regrowth of the pattern is caught by bytes
    "tpch_q16_part_supplier_counts",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
]

#: flag only when growth is BOTH >threshold relatively and >this many
#: bytes absolutely — a 100 KB exchange growing 1.3x is 30 KB of
#: payload noise, not a plan regression
ABS_FLOOR_BYTES = 64 * 1024


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _ui_session(name: str):
    """A session with the UI REST API enabled (the shared builder
    disables the UI; this experiment is its only consumer)."""
    spark = get_spark(
        app_name=name,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return _get(f"{ui}/api/v1/applications/{app_id}/stages")


def measure(spark, name: str, sf_dir: str) -> dict:
    """Run one query to completion and attribute ONLY its stages:
    the completed-stage set is snapshotted before and after, so many
    queries can share one session (stage history retention default is
    1000 stages — far above a 22-query sweep)."""
    before = {(s["stageId"], s["attemptId"]) for s in _stages(spark)}
    spark.catalog.clearCache()
    t0 = time.time()
    rows = QUERIES[name](spark, sf_dir).count()
    sec = round(time.time() - t0, 2)
    new = [
        s
        for s in _stages(spark)
        if (s["stageId"], s["attemptId"]) not in before
    ]
    wbytes = sum(s.get("shuffleWriteBytes", 0) for s in new)
    wrecs = sum(s.get("shuffleWriteRecords", 0) for s in new)
    return {
        "bytes": wbytes,
        "mb": round(wbytes / 1e6, 2),
        "records": wrecs,
        "stages": len(new),
        "rows": rows,
        "sec": sec,
    }


def run_set(names: list[str], sf_dir: str) -> dict:
    spark = _ui_session("exchange_bytes_baseline")
    out: dict[str, dict] = {}
    for name in names:
        rec = measure(spark, name, sf_dir)
        out[name] = rec
        print(f"# {name}: {rec['mb']} MB, {rec['records']} records, "
              f"{rec['stages']} stages, {rec['rows']} rows, {rec['sec']}s",
              file=sys.stderr)
    return {"sf_dir": sf_dir, "queries": out}


def check(baseline_path: str, sf_dir: str | None, threshold: float,
          out_path: str | None) -> int:
    base = json.load(open(baseline_path))
    sf = sf_dir or base["sf_dir"]
    fresh = run_set(list(base["queries"]), sf)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(fresh, fh, indent=1)
    failures = []
    for name, b in base["queries"].items():
        n = fresh["queries"][name]
        grew = (
            n["bytes"] > b["bytes"] * threshold
            and n["bytes"] - b["bytes"] > ABS_FLOOR_BYTES
        )
        ratio = n["bytes"] / b["bytes"] if b["bytes"] else float("inf")
        line = (f"{name}: {b['mb']} -> {n['mb']} MB ({ratio:.2f}x), "
                f"records {b['records']} -> {n['records']}")
        if grew:
            failures.append(line)
            print(f"BYTE REGRESSION {line}")
        elif ratio < 1 / threshold:
            print(f"shrunk {line}")
    print(json.dumps({
        "checked": len(base["queries"]),
        "threshold": threshold,
        "byte_regressions": len(failures),
        "sf_dir": sf,
    }))
    return 1 if failures else 0


def main() -> int:
    argv = sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2

    if argv[0] == "--baseline":
        out_path = argv[1]
        rest = argv[2:]
        sf_dir = "/root/testdata/sf0.1"
        if rest[:1] == ["--sf"]:
            sf_dir, rest = rest[1], rest[2:]
        names = rest or BASELINE_SET
        result = run_set(names, sf_dir)
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps({
            "baseline": out_path,
            "queries": len(names),
            "total_mb": round(
                sum(q["bytes"] for q in result["queries"].values()) / 1e6, 2
            ),
            "sf_dir": sf_dir,
        }))
        return 0

    if argv[0] == "--check":
        baseline_path = argv[1]
        rest = argv[2:]
        sf_dir, threshold, out_path = None, 1.2, None
        while rest:
            if rest[0] == "--sf":
                sf_dir, rest = rest[1], rest[2:]
            elif rest[0] == "--threshold":
                threshold, rest = float(rest[1]), rest[2:]
            elif rest[0] == "--out":
                out_path, rest = rest[1], rest[2:]
            else:
                print(f"unknown arg {rest[0]}")
                return 2
        return check(baseline_path, sf_dir, threshold, out_path)

    # single-query mode (round-10 shape)
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    spark = _ui_session(f"exchange_bytes_{name}")
    rec = measure(spark, name, sf_dir)
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "rows": rec["rows"],
        "sec": rec["sec"],
        "shuffle_write_bytes": rec["bytes"],
        "shuffle_write_mb": round(rec["bytes"] / 1e6, 1),
        "shuffle_write_records": rec["records"],
        "stages": rec["stages"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
