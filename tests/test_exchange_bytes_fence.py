"""Exchange-BYTES fence (VERDICT r10 item 2): the byte-level
complement to test_plans.py's exchange-COUNT budgets.

Wall-clock at sf0.1 spreads ±7% between same-code runs, so the bench
ratchet can't see a <1.3x plan regression; shuffle-write BYTES are
deterministic (measured twice at sf0.01: identical records, bytes
within 2%), so a >1.2x byte growth on any baselined query is real
plan drift, not noise. The baseline pins the ratchet set (27 queries
as of r12) — the top-20 most expensive headline queries by
BENCH_r10.json, the r9→r10 and r10→r11 variance-suspect wall-clock
flags (events_bot_signals; sim_cosine_topk, ts_window_moving_avg —
so their next wobble is byte-adjudicated), the r10 carry-over
sim_rp_lsh_pairs, and the three r11 join-filter-below-aggregate
rewrites (q16/q20/q21) so regrowth of that pattern is caught.

Runs in a SUBPROCESS: the measurement reads per-stage shuffle metrics
from the Spark UI REST API, which the shared test session disables —
a fresh JVM with the UI on is the one honest way to get the same
numbers the SCALE.md baselines were recorded with. (~60 s at sf0.01.)

Regenerate the baseline after an INTENTIONAL plan change:

    python scripts/exp_exchange_bytes.py \
        --baseline tests/exchange_baseline_sf001.json \
        --sf /root/testdata/sf0.01
"""

import json
import os
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
SF_DIR = os.environ.get("SPARK_GRAFT_EXB_SF_DIR", "/root/testdata/sf0.01")
# the baseline must MATCH the measured scale factor: overriding
# SF_DIR to sf0.1 selects the sf0.1 baseline (scripts/) instead of
# comparing sf0.1 bytes against the sf0.01 pin (which would flag ~10x
# on every query)
BASELINE = (
    os.path.join(_REPO, "scripts", "exchange_baseline_sf01.json")
    if SF_DIR.rstrip("/").endswith("sf0.1")
    else os.path.join(_HERE, "exchange_baseline_sf001.json")
)


def test_baseline_queries_are_registered():
    from refluxdb_spark.queries import QUERIES
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from exp_exchange_bytes import BASELINE_SET, WARM_REQUIRED

    # BOTH committed baselines must track BASELINE_SET — checking only
    # the env-selected one would let the sf0.1 file drift silently in
    # default (sf0.01) CI runs
    for path in (
        os.path.join(_HERE, "exchange_baseline_sf001.json"),
        os.path.join(_REPO, "scripts", "exchange_baseline_sf01.json"),
    ):
        base = json.load(open(path))
        assert sorted(base["queries"]) == sorted(BASELINE_SET), path
        missing = [q for q in base["queries"] if q not in QUERIES]
        assert not missing, f"{path}: baselined queries not in QUERIES: {missing}"
    # the force-warm list must track the registry: a renamed query
    # left behind here would silently lose its cold-cache protection
    stale = [q for q in WARM_REQUIRED if q not in QUERIES]
    assert not stale, f"WARM_REQUIRED names not in QUERIES: {stale}"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_exchange_bytes_within_budget(tmp_path):
    out = tmp_path / "remeasured.json"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "scripts", "exp_exchange_bytes.py"),
            "--check", BASELINE,
            "--sf", SF_DIR,
            "--threshold", "1.2",
            "--out", str(out),
            # VERDICT r12 item 3: in --check an undercounted (unsettled)
            # re-measure can mask a real regression — the fence fails on
            # the settle timeout instead of trusting the suspect row
            "--strict",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=_REPO,
    )
    assert r.returncode == 0, (
        f"exchange-byte regression(s) vs {BASELINE} "
        f"— if the plan change was intentional, regenerate the baseline "
        f"(see module docstring)\n--- stdout ---\n{r.stdout}\n"
        f"--- stderr tail ---\n{r.stderr[-2000:]}"
    )
    # the re-measurement must actually have run every baselined query
    fresh = json.loads(out.read_text())
    base = json.load(open(BASELINE))
    assert sorted(fresh["queries"]) == sorted(base["queries"])
    ran = sum(1 for q in fresh["queries"].values() if q["stages"] > 0)
    assert ran == len(base["queries"])


def test_cli_operand_validation_exits_2_without_spark(monkeypatch, capsys):
    """ADVICE r11: missing operands (`--baseline` alone, `--sf` as the
    last token) must print usage and exit 2, not raise IndexError; an
    unknown query name anywhere in the --baseline remainder must be
    rejected instead of KeyErroring mid-sweep. All cases return before
    any SparkSession is built, so this runs in-process."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import exp_exchange_bytes as xb

    cases = [
        ["--baseline"],
        ["--baseline", "--sf"],
        ["--baseline", "/tmp/out.json", "--sf"],
        ["--baseline", "/tmp/out.json", "no_such_query_xyz"],
        # --sf AFTER query names must parse as a flag, not a query
        ["--baseline", "/tmp/out.json", "no_such_query_xyz", "--sf", "/x"],
        ["--check"],
        ["--check", "base.json", "--threshold"],
        ["--check", "base.json", "--threshold", "abc"],
        ["--check", "base.json", "--bogus"],
        ["no_such_query_xyz"],
    ]
    for argv in cases:
        monkeypatch.setattr(sys, "argv", ["exp_exchange_bytes.py"] + argv)
        assert xb.main() == 2, f"argv {argv} should exit 2"
        assert "error:" in capsys.readouterr().err


def _baseline_file(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text(json.dumps({"sf_dir": "/root/testdata/sf0.01",
                             "queries": rows}))
    return str(p)


def _row(nbytes, settled=None):
    r = {"bytes": nbytes, "mb": nbytes / 1e6, "records": nbytes,
         "stages": 1, "rows": 1, "sec": 0.1}
    if settled is not None:
        r["settled"] = settled
    return r


def test_check_strict_settle_handling(monkeypatch, capsys, tmp_path):
    """VERDICT r12 item 3 + ADVICE r12: a row whose stage metrics
    never settled carries `"settled": false`; --strict turns that from
    a warning into a failure. All three legs run without Spark: the
    baseline-rejection leg returns before run_set, and the fresh-row
    legs monkeypatch run_set."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import exp_exchange_bytes as xb

    from refluxdb_spark.queries import QUERIES
    q = next(iter(QUERIES))  # any registered name passes validation

    # 1. strict REJECTS an unsettled baseline row before the sweep
    bad_base = _baseline_file(tmp_path, "bad.json",
                              {q: _row(1000, settled=False)})
    assert xb.check(bad_base, None, 1.2, None, strict=True) == 2
    assert "unsettled" in capsys.readouterr().err

    # 2. strict FAILS on an unsettled fresh row even with no byte growth
    good_base = _baseline_file(tmp_path, "good.json", {q: _row(1000)})
    monkeypatch.setattr(xb, "run_set", lambda names, sf: {
        "sf_dir": sf, "queries": {q: _row(1000, settled=False)}})
    assert xb.check(good_base, None, 1.2, None, strict=True) == 1
    out = capsys.readouterr().out
    assert "UNSETTLED" in out and '"unsettled": 1' in out

    # 3. non-strict only WARNS on the same condition (exit 0), and a
    #    settled clean re-measure passes under strict
    assert xb.check(good_base, None, 1.2, None, strict=False) == 0
    assert "unsettled" in capsys.readouterr().out
    monkeypatch.setattr(xb, "run_set", lambda names, sf: {
        "sf_dir": sf, "queries": {q: _row(1000)}})
    assert xb.check(good_base, None, 1.2, None, strict=True) == 0


def test_baseline_mode_surfaces_unsettled_rows(monkeypatch, capsys, tmp_path):
    """Code review r13: --baseline writes artifacts destined for
    commit and the round-gate diff — a suspect row must appear in the
    summary JSON's "unsettled" list AND flip the exit code to 1, not
    hide in a stderr warning. run_set is monkeypatched, so no Spark."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import exp_exchange_bytes as xb

    from refluxdb_spark.queries import QUERIES
    q = next(iter(QUERIES))
    out = tmp_path / "prof.json"

    for settled_kw, want_exit, want_unsettled in [
        ({}, 0, []), ({"settled": False}, 1, [q]),
    ]:
        monkeypatch.setattr(xb, "run_set", lambda names, sf, kw=settled_kw: {
            "sf_dir": sf, "queries": {q: _row(1000, **kw)}})
        monkeypatch.setattr(
            sys, "argv",
            ["exp_exchange_bytes.py", "--baseline", str(out), q],
        )
        assert xb.main() == want_exit
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["unsettled"] == want_unsettled
        # the artifact itself is still written for inspection
        assert q in json.loads(out.read_text())["queries"]


def test_measure_marks_unsettled_rows(monkeypatch):
    """measure() must stamp `"settled": false` when EITHER surrounding
    stage read times out (an unsettled before-read over-counts, an
    unsettled after-read under-counts), and omit the key entirely on
    trusted rows so committed pre-r13 artifacts stay byte-identical.
    Pure Python: spark + the stage poll are faked."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import exp_exchange_bytes as xb

    class _Df:
        def count(self):
            return 7

    class _Spark:
        class catalog:
            @staticmethod
            def clearCache():
                pass

    fn = lambda spark, sf: _Df()  # noqa: E731
    for pre_ok, post_ok in [(True, True), (False, True), (True, False)]:
        oks = iter([pre_ok, post_ok])
        monkeypatch.setattr(
            xb, "_settled_new_stages", lambda spark, before: ([], next(oks))
        )
        rec = xb.measure(_Spark(), "fake", "/none", fn=fn)
        if pre_ok and post_ok:
            assert "settled" not in rec
        else:
            assert rec["settled"] is False
        assert rec["rows"] == 7


def test_committed_full_registry_profiles_cover_the_registry():
    """The round gate diffs fresh profiles against the committed
    full-registry artifacts (scripts/exchange_profile_sf001.json and
    scripts/exchange_profile_sf01.json, r12) — that only works if the
    artifacts cover the registry EXACTLY, so a registry change must
    force a profile regeneration here. No Spark needed."""
    from refluxdb_spark.queries import QUERIES

    for fname in ("exchange_profile_sf001.json", "exchange_profile_sf01.json"):
        path = os.path.join(_REPO, "scripts", fname)
        prof = json.load(open(path))["queries"]
        assert sorted(prof) == sorted(QUERIES), (
            f"{fname} does not match the query registry — regenerate it "
            f"(see .claude/skills/verify/SKILL.md round-gate recipe)"
        )
        # every row must be a real measurement, not a placeholder
        assert all(q["stages"] > 0 for q in prof.values())
