"""Contracts for the weak-scaling data builder (scripts/exp_scaling.py).

The x30 spot-checks in SCALE.md §9 are only evidence if the builder
replicates the WORKLOAD faithfully: fact/dimension keys must move in
lockstep (no cross-copy join fan-out) and the genuinely fixed dims
(nation/region — 25/5 rows at every TPC-H scale factor) must stay
single-copy. Round 8 caught the builder replicating nation un-offset:
every fact→nation join fanned out factor-fold and the x30 BFS
measured 65x from the artifact alone. These tests pin the contract at
factor 2 on sf0.001 so the bug class can't silently return.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)


@pytest.fixture(scope="module")
def scaled_x2(spark, sf_dir, tmp_path_factory):
    import exp_scaling

    old_src, old_work = exp_scaling.SRC, exp_scaling.WORK
    exp_scaling.SRC = sf_dir
    exp_scaling.WORK = str(tmp_path_factory.mktemp("scaling"))
    try:
        yield exp_scaling.build_scaled(spark, 2)
    finally:
        exp_scaling.SRC, exp_scaling.WORK = old_src, old_work


def test_fixed_dims_stay_single_copy(spark, sf_dir, scaled_x2):
    for t in ("nation", "region"):
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        scaled = spark.read.parquet(f"{scaled_x2}/{t}.parquet").count()
        assert scaled == base, f"{t} must not replicate (fixed dim)"


def test_fact_tables_replicate_by_factor(spark, sf_dir, scaled_x2):
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        scaled = spark.read.parquet(f"{scaled_x2}/{t}.parquet").count()
        assert scaled == 2 * base, f"{t} must replicate exactly 2x"


def test_no_cross_copy_join_fanout(spark, sf_dir, scaled_x2):
    """Every FK join must produce exactly factor x the base match
    count: an un-offset (or duplicated) key on either side shows up
    here as a multiplied join output — the exact artifact that made
    the x30 BFS read 65x."""
    joins = [
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    def match_count(root: str, ft: str, fk: str, dt: str, dk: str) -> int:
        fact = spark.read.parquet(f"{root}/{ft}.parquet").select(fk)
        dim = (
            spark.read.parquet(f"{root}/{dt}.parquet")
            .select(dk)
            .withColumnRenamed(dk, fk)
        )
        return fact.join(dim, fk).count()

    for ft, fk, dt, dk in joins:
        base = match_count(sf_dir, ft, fk, dt, dk)
        fact_mult = 1 if ft in ("nation", "region") else 2
        scaled = match_count(scaled_x2, ft, fk, dt, dk)
        assert scaled == fact_mult * base, (
            f"{ft}.{fk} -> {dt}.{dk}: expected {fact_mult}x match count, "
            f"got {scaled} vs base {base} (cross-copy fan-out?)"
        )


def test_document_copies_are_distinct_work(spark, sf_dir, scaled_x2):
    """Shingle-based dedup must see the copies as distinct corpora:
    exact-duplicate TEXT across copies would let fingerprint caches /
    dedup collapse the scaled workload back to 1x."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{scaled_x2}/documents.parquet")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    distinct_texts = docs.select(F.md5("text")).distinct().count()
    # within-copy duplicates exist by design; cross-copy duplicates
    # must not (distinct texts must exceed the single-copy count)
    assert distinct_texts > base


def test_main_arg_errors_exit_2_with_usage(monkeypatch, capsys):
    """--tier without a valid operand, unknown --flags, and non-integer
    factors must exit 2 with a message, not traceback through int()/
    TIERS[] (same class as the r14 bench_compare unknown-flag fix).
    All reject BEFORE any Spark session or corpus build."""
    import sys

    import pytest

    import exp_scaling as es

    for argv, frag in [
        (["exp_scaling.py", "--tier"], "--tier requires"),
        # an out-of-range tier number: derive it from TIERS instead of
        # hardcoding (r18 added tier 9 and the hardcoded "9" case
        # silently became VALID — the "invalid" probe ran a full sweep)
        (["exp_scaling.py", "--tier", str(max(es.TIERS) + 1)],
         "--tier requires"),
        (["exp_scaling.py", "--tier", "x"], "--tier requires"),
        (["exp_scaling.py", "--teir", "2"], "unknown flag"),
        # ADVICE r15: a LATE --tier is position-invalid — the message
        # must say so, not the self-contradictory "unknown: --tier
        # (known: --tier)"
        (["exp_scaling.py", "3", "--tier", "2"],
         "--tier must be the first argument"),
        (["exp_scaling.py", "three"], "factors must be integers"),
        (["exp_scaling.py", "0"], "factors must be >= 1"),
        (["exp_scaling.py", "-3"], "factors must be >= 1"),
    ]:
        monkeypatch.setattr(sys, "argv", argv)
        with pytest.raises(SystemExit) as exc:
            es.main()
        assert exc.value.code == 2, argv
        assert frag in capsys.readouterr().err, argv
    # valid tiers 1..9 pass the guard (1 = MEASURED, 2-9 = TIERS)
    assert sorted({1, *es.TIERS}) == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_exp_tag_index_arg_errors_exit_2(monkeypatch, capsys):
    """exp_tag_index CLI guards: unknown flags, non-integer and
    non-positive factors reject with usage BEFORE any Spark session."""
    import sys

    import exp_tag_index as eti

    for argv, frag in [
        (["exp_tag_index.py", "--fast"], "unknown flag"),
        (["exp_tag_index.py", "three"], "factors must be integers"),
        (["exp_tag_index.py", "0"], "factors must be >= 1"),
        (["exp_tag_index.py", "-1"], "factors must be >= 1"),
    ]:
        monkeypatch.setattr(sys, "argv", argv)
        assert eti.main() == 2, argv
        assert frag in capsys.readouterr().err, argv
