"""Deterministic sketches as pure DataFrame compositions.

``approx_count_distinct`` (Spark) and DuckDB's equivalent use
different HLL implementations, so their estimates can never
cross-check. This module rebuilds HyperLogLog from its definition on
an md5-derived hash — every intermediate is integer-exact, so two
engines (or two cluster layouts) produce the IDENTICAL estimate,
which makes the sketch itself oracle-testable and its merges
reproducible.

Scale shape: the register table is the aggregation state — ``m = 2^p``
rows per group, independent of input size. The shuffle carries
(group, bucket, partial-max-rho): map-side combined, fixed width. A
100 TB distinct-count costs one scan + one tiny shuffle; register
tables from different partitions/days/engines merge by ``MAX`` (the
HLL merge property), so rollups compose without rescanning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit deterministic hash: 15 hex chars of md5 (fits a signed BIGINT,
# no sign wrap). p bucket bits + (60 - p) rho bits.
_HASH_BITS = 60


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-group HLL register table: (by..., bucket, rho_max).

    bucket = hash mod m; rho = 1 + leading-zero count of the remaining
    ``60 - p`` bits, computed exactly via the binary-string length
    (``bin()``) — no float log anywhere. Only occupied buckets appear;
    ``hll_estimate`` accounts for the empty ones arithmetically.
    """
    by = by or []
    m = 1 << p
    rbits = _HASH_BITS - p
    h = F.expr(
        f"cast(conv(substring(md5(cast({col} as string)), 1, 15), 16, 10) as bigint)"
    )
    d = df.select(*by, (h % m).alias("bucket"), F.expr(
        f"cast(conv(substring(md5(cast({col} as string)), 1, 15), 16, 10) as bigint)"
        f" div {m}"
    ).alias("_rem"))
    rho = (
        F.when(F.col("_rem") == 0, F.lit(rbits + 1))
        .otherwise(F.lit(rbits + 1) - F.length(F.expr("bin(_rem)")))
    )
    return (
        d.withColumn("rho", rho)
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(
    df: DataFrame,
    col: str,
    p: int = 8,
    by: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group, deterministically.

    The raw-HLL harmonic mean sums ``2^-rho_max`` over all m registers;
    summing those dyadics in double would be shuffle-order-dependent
    (a 53-bit mantissa can't hold 2^-1 + 2^-53 exactly), so the sum is
    scaled to INTEGERS — ``2^(rbits+1-rho_max)`` as BIGINT, exact and
    order-independent, at most m·2^(rbits+1) < 2^62 — and divided back
    once at the end. Empty registers (rho_max = 0) each contribute the
    full 2^(rbits+1) term, added ARITHMETICALLY from the occupied-
    bucket count — no grid join, so the whole estimate is two shuffles
    (registers + per-group fold). Raw HLL only — no small/large-range
    bias correction — a documented estimator choice (±1.04/√m relative
    error) that keeps the estimate one fixed cross-engine expression.
    """
    return hll_estimate_from_registers(hll_registers(df, col, p, by), p, by)


def hll_estimate_from_registers(
    regs: DataFrame,
    p: int = 8,
    by: list[str] | None = None,
) -> DataFrame:
    """Estimate from an existing (by..., bucket, rho_max) register
    table — the half of ``hll_estimate`` that runs AFTER merges, so
    registers merged across days/partitions/engines (by MAX) estimate
    with the identical fixed expression."""
    by = by or []
    m = 1 << p
    rbits = _HASH_BITS - p
    scale = 1 << (rbits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.expr(f"cast(shiftleft(cast(1 as bigint), {rbits + 1} - rho_max) as bigint)")
    return (
        regs.groupBy(*by)
        .agg(
            F.sum(term).alias("_occ_sum"),
            F.count(F.lit(1)).alias("_occ_n"),
        )
        .withColumn(
            "hll_estimate",
            F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(scale))
            / (
                F.col("_occ_sum") + (F.lit(m) - F.col("_occ_n")) * F.lit(scale)
            ).cast("double"),
        )
        .drop("_occ_sum", "_occ_n")
    )


def hll_estimate_corrected_from_registers(
    regs: DataFrame,
    p: int = 8,
    by: list[str] | None = None,
) -> DataFrame:
    """HLL estimate with Flajolet's LinearCounting small-range switch:
    when the raw harmonic-mean estimate is <= 2.5m and at least one
    register is empty, register OCCUPANCY is the better statistic and
    the estimate becomes ``m * ln(m / V)`` with ``V = m - occupied``
    (exact integers into one IEEE ln). Raw HLL floors at ~0.72m for
    tiny sets — useless for ball-size DIFFERENCES, which is exactly
    what HyperBall (``graph.hyperball_harmonic``) integrates, so that
    operator routes through this estimator. Rounded to 6 digits so a
    1-ulp libm ``ln`` difference between engines cannot surface; the
    raw branch is rounded identically so the output column has ONE
    precision contract. Same merge discipline as
    ``hll_estimate_from_registers``: estimate AFTER max-merging."""
    by = by or []
    m = 1 << p
    rbits = _HASH_BITS - p
    scale = 1 << (rbits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.expr(f"cast(shiftleft(cast(1 as bigint), {rbits + 1} - rho_max) as bigint)")
    raw = (
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(scale))
        / (
            F.col("_occ_sum") + (F.lit(m) - F.col("_occ_n")) * F.lit(scale)
        ).cast("double")
    )
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(m) - F.col("_occ_n")).cast("double")
    )
    return (
        regs.groupBy(*by)
        .agg(
            F.sum(term).alias("_occ_sum"),
            F.count(F.lit(1)).alias("_occ_n"),
        )
        .withColumn(
            "hll_estimate",
            F.when(
                (raw <= F.lit(2.5 * m)) & (F.col("_occ_n") < F.lit(m)),
                F.round(linear, 6),
            ).otherwise(F.round(raw, 6)),
        )
        .drop("_occ_sum", "_occ_n")
    )


def countmin_counters(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    by: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch counters: (by..., row, bucket, cnt) — ``depth``
    md5-seeded hash rows over a ``width``-bucket range.

    Like the HLL here, the point is determinism: engine-native
    frequency sketches can't cross-check, this one is the same counter
    matrix on any engine/layout. State is depth·width cells per group
    regardless of input size; matrices MERGE BY ADDITION across
    partitions/days (the CM property), so a year of daily sketches
    answers "top talkers last quarter" without rescanning."""
    by = by or []
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    d = df.select(*by, F.col(col).cast("string").alias("_k")).select(
        *by, "_k", rows
    )
    bucket = F.expr(
        f"cast(conv(substring(md5(concat('cm', row, '|', _k)), 1, 15), 16, 10) as bigint) % {width}"
    )
    return (
        d.withColumn("bucket", bucket)
        .groupBy(*by, "row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-key frequency estimate: min over hash rows of the key's
    counter — the classic CM upper bound (est >= true, with the
    overestimate bounded by collisions ~ N/width per row). Returns
    (key, cms_est) for every distinct key; integer-exact, so the
    estimate itself is oracle-testable."""
    counters = countmin_counters(df, col, depth, width)
    keys = df.select(F.col(col).cast("string").alias("_k")).distinct()
    probes = keys.select(
        "_k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    ).withColumn(
        "bucket",
        F.expr(
            f"cast(conv(substring(md5(concat('cm', row, '|', _k)), 1, 15), 16, 10) as bigint) % {width}"
        ),
    )
    return (
        probes.join(counters, ["row", "bucket"])
        .groupBy("_k")
        .agg(F.min("cnt").alias("cms_est"))
        .select(F.col("_k").alias(col), "cms_est")
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    by: list[str] | None = None,
) -> DataFrame:
    """Fixed-bin histogram quantile estimates — the third mergeable
    sketch (HLL: distinct, CM: frequency, histogram: distribution).

    bin = floor((x - lo)/width) clamped to [0, bins-1]; the q-quantile
    estimate is the LOWER EDGE of the first bin whose cumulative count
    reaches ceil(q·n) (documented estimator: error ≤ one bin width).
    Bin counts are integers and merge by addition across
    partitions/days; the only floats are the bin-index expression and
    the edge reconstruction, both fixed-order and engine-identical.
    Returns (by..., q, est, n)."""
    by = by or []
    width = (hi - lo) / bins
    b = (
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
        .cast("bigint")
    )
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    counts = (
        # NULLs are excluded from the distribution: a NULL bin would
        # survive the groupBy and sort first on Spark but last on DuckDB,
        # silently skewing cumulative counts on NULL-bearing inputs
        df.filter(F.col(col).isNotNull())
        .select(*by, b.alias("bin"))
        .groupBy(*by, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*(by or [F.lit(1)])).orderBy("bin")
    cum = counts.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*(by or [F.lit(1)])))
    )
    out = None
    for q in qs:
        hit = (
            cum.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")))
            .groupBy(*by)
            .agg(F.min("bin").alias("_bin"), F.max("n").alias("n"))
            .select(
                *by,
                F.lit(q).alias("q"),
                (F.lit(lo) + F.col("_bin").cast("double") * F.lit(width)).alias("est"),
                F.col("n").cast("bigint").alias("n"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def bloom_bits(
    df: DataFrame,
    col: str,
    k: int = 4,
    m_bits: int = 32768,
    by: list[str] | None = None,
) -> DataFrame:
    """Bloom filter as a relation: (by..., bit) — the distinct set-bit
    positions of a ``k``-hash, ``m_bits``-wide filter over ``col``.

    Fourth mergeable sketch (HLL: distinct, CM: frequency, histogram:
    distribution, Bloom: membership). Filters merge by UNION (bitwise
    OR); the relation form keeps it a pure DataFrame — a day's filter
    is ~m_bits rows max regardless of input, and the md5-derived
    positions are identical on any engine, so membership answers are
    oracle-testable."""
    by = by or []
    d = df.select(*by, F.col(col).cast("string").alias("_k"))
    rows = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    bit = F.expr(
        f"cast(conv(substring(md5(concat('bf', i, '|', _k)), 1, 15), 16, 10) as bigint) % {m_bits}"
    )
    return (
        d.select(*by, "_k", rows)
        .select(*by, bit.alias("bit"))
        .distinct()
    )


def bloom_maybe_contains(
    bits: DataFrame,
    probes: DataFrame,
    col: str,
    k: int = 4,
    m_bits: int = 32768,
    by: list[str] | None = None,
    out: str = "maybe_present",
) -> DataFrame:
    """Probe a Bloom relation: a key is 'possibly present' iff ALL k of
    its bit positions are set (no false negatives; false-positive rate
    ~(1 - e^(-k·n/m))^k). The probe side explodes k rows per key and
    counts matches against the (small, broadcastable) bit relation."""
    by = by or []
    p = probes.select(*by, F.col(col).cast("string").alias("_k")).distinct()
    rows = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    bit = F.expr(
        f"cast(conv(substring(md5(concat('bf', i, '|', _k)), 1, 15), 16, 10) as bigint) % {m_bits}"
    )
    probe_bits = p.select(*by, "_k", rows).select(*by, "_k", bit.alias("bit"))
    hits = (
        probe_bits.join(F.broadcast(bits), [*by, "bit"], "left_semi")
        .groupBy(*by, "_k")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        p.join(hits, [*by, "_k"], "left")
        .withColumn(out, F.coalesce(F.col("_hits"), F.lit(0)) == k)
        .select(*by, F.col("_k").alias(col), out)
    )


def kmv_hashes(
    df: DataFrame,
    col: str,
    k: int = 32,
    by: list[str] | None = None,
    presalt: int = 0,
) -> DataFrame:
    """K-minimum-values distinct sketch state: the k smallest 60-bit
    md5 hashes of the distinct values per group — (by..., rank, h).

    Like the HLL registers above, the state is md5-derived and
    integer-exact, so the sketch itself is oracle-testable and
    engine-invariant. KMV's merge is union-then-retake-k-smallest
    (``kmv_hashes`` over the unioned state), the property that lets
    per-day/per-partition sketches roll up without rescanning.

    Scale: distinct on (by, value) collapses map-side; the top-k window
    keeps k rows per group — state size k, independent of input. With
    no grouping keys the bottom-k window would otherwise pull EVERY
    distinct hash to one partition; ``presalt > 0`` inserts a
    deterministic two-stage cut (bottom-k per hash-derived salt bucket
    in parallel, then the ≤ presalt·k survivors re-cut globally — the
    sketch's own mergeability applied inside the operator), which
    produces the IDENTICAL state with the wide stage parallel. The
    salt is h mod presalt, so no row moves twice for it.
    """
    by = by or []
    h = F.expr(
        f"cast(conv(substring(md5(cast({col} as string)), 1, 15), 16, 10) as bigint)"
    )
    d = df.select(*by, F.col(col)).distinct().select(*by, h.alias("h")).distinct()
    if presalt > 0:
        ws = Window.partitionBy(
            *[F.col(c) for c in by], F.pmod(F.col("h"), F.lit(presalt))
        ).orderBy(F.col("h").asc())
        d = (
            d.withColumn("_sr", F.row_number().over(ws))
            .filter(F.col("_sr") <= k)
            .drop("_sr")
        )
    w = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy(
        F.col("h").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*by, "rank", "h")
    )


def kmv_estimate(
    hashes: DataFrame,
    k: int = 32,
    by: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate from KMV state: with the k-th smallest
    hash h_k over a hash space of size 2^60, the classic estimator is
    ``(k-1) * 2^60 / h_k``; fewer than k hashes means the state IS the
    distinct set and the count is exact. Both branches are expressions
    on exactly-representable doubles (2^60 and k-1 fit the mantissa
    product), so the estimate is bit-identical cross-engine.
    """
    by = by or []
    space = float(1 << 60)
    return hashes.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_state"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(space) / F.max("h").cast("double")
        ).alias("kmv_estimate"),
    )


def kmv_merge(
    states: DataFrame,
    k: int = 32,
    by: list[str] | None = None,
) -> DataFrame:
    """Merge KMV states (the union of any number of ``kmv_hashes``
    outputs): distinct hashes, re-take the k smallest per group. The
    result is EXACTLY the state a single pass over the combined data
    would have produced — the mergeability contract that lets per-day
    / per-partition sketches roll up (tested:
    ``test_kmv_merge_equals_global``)."""
    by = by or []
    d = states.select(*by, "h").distinct()
    w = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy(
        F.col("h").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*by, "rank", "h")
    )


def quantile_sample_state(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    k: int = 256,
    by: list[str] | None = None,
    fanin: int = 64,
) -> DataFrame:
    """Mergeable quantile-sketch state: the rows whose 60-bit md5 key
    hashes are the k smallest per group — (by..., rank, h, v).

    This is the hash-sample answer to KLL (Karnin-Lang-Liberty, FOCS
    2016) / t-digest: those get better space-accuracy trade-offs from
    RANDOMIZED or insertion-order-dependent compactions, which makes
    their state partition-layout-dependent — two cluster runs (or two
    engines) produce different sketches, so neither can be
    value-oracled. Bottom-k-by-hash is the deterministic, order-FREE
    point in that design space: the retained rows are a uniform random
    sample (hash order is value-independent), giving
    distribution-independent rank error O(sqrt(q(1-q)/k)) — worse
    space for a target error than KLL's O((1/eps)·loglog), but
    engine-invariant, exactly mergeable, and testable bit-for-bit,
    the same trade every sketch in this module makes.

    Scale: bottom-k is computed in TWO levels — per-(group, salt)
    bottom-k over ``fanin`` salt buckets, then bottom-k of the
    fanin*k survivors — so no single sort ever sees a whole 100 TB
    group; level 1 sorts hash-partitioned slices, level 2 sorts k*fanin
    rows. Exactly equal to a single global bottom-k (any global
    bottom-k row is its salt bucket's bottom-k too — the mergeability
    property). Merge of per-day/per-partition states:
    ``quantile_sample_merge``."""
    by = by or []
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    base = df.select(*by, h.alias("h"), F.col(value_col).alias("v"))
    w1 = Window.partitionBy(
        *[F.col(c) for c in by], F.col("_salt")
    ).orderBy(F.col("h").asc(), F.col("v").asc())
    lvl1 = (
        base.withColumn("_salt", F.pmod(F.col("h"), F.lit(fanin)))
        .withColumn("_rk", F.row_number().over(w1))
        .filter(F.col("_rk") <= k)
        .drop("_salt", "_rk")
    )
    w2 = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    return (
        lvl1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(*by, "rank", "h", "v")
    )


def quantile_sample_merge(
    states: DataFrame,
    k: int = 256,
    by: list[str] | None = None,
) -> DataFrame:
    """Merge quantile-sample states (union of any number of
    ``quantile_sample_state`` outputs): distinct (h, v) rows, re-take
    the k hash-smallest per group — EXACTLY the state one pass over
    the combined data would produce (rows present in several states
    share their hash and collapse), the same contract as
    ``kmv_merge``.

    Contract scope (ADVICE r17): merge ≡ single-pass holds when
    ``key_cols`` uniquely identify rows within a group, which is how
    every caller in this repo uses it (event_id / doc_id keys). If the
    SAME (key, value) row genuinely occurs in several states — i.e.
    key_cols are NOT unique row ids — a single pass keeps each
    occurrence in its own bottom-k slot while distinct() collapses
    them to one; with non-unique keys, count multiplicity upstream
    (carry an occurrence column into key_cols) instead of relying on
    this merge."""
    by = by or []
    d = states.select(*by, "h", "v").distinct()
    w = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*by, "rank", "h", "v")
    )


def quantile_sample_values(
    state: DataFrame,
    qs: list[float],
    by: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (by..., h, v) relation: rank the
    retained values (tiebreak by hash — fully deterministic), pick the
    row at index ``max(1, ceil(q * s))`` per quantile. Works on a
    SKETCH state (estimates) or on the full base relation (the exact
    twin, for quality gates) — the rule is the same, so estimate and
    truth differ only by sampling. Returns (by..., q, n_state, value);
    q is exposed as a double on both engines."""
    by = by or []
    w = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy(
        F.col("v").asc(), F.col("h").asc()
    )
    cw = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)])
    ranked = (
        state.select(*by, "h", "v")
        .withColumn("_vr", F.row_number().over(w))
        .withColumn("_s", F.count(F.lit(1)).over(cw))
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(*by, "_vr", "_s", "v", F.explode(qarr).alias("q"))
        .filter(
            F.col("_vr")
            == F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.col("q") * F.col("_s")).cast("bigint"),
            )
        )
        .select(
            *by,
            "q",
            F.col("_s").cast("bigint").alias("n_state"),
            F.col("v").alias("value"),
        )
    )


def ams_f2_estimate(
    df: DataFrame,
    key_col: str,
    estimators: int = 16,
    group_size: int = 4,
    seed: str = "ams",
) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) tug-of-war sketch of the second
    frequency moment F2 = Σ_key count(key)² — the self-join-size /
    skew statistic that decides salting and join strategy, estimated
    in O(estimators) space instead of a per-key aggregate.

    Each estimator i keeps one counter S_i = Σ_rows sign_i(key) with
    sign_i(key) = ±1 from the low bit of a 32-bit md5 (engine-exact);
    E[S_i²] = F2. The classic variance reduction applies: mean within
    each group of ``group_size`` estimators, then the exact two-middle
    median across groups. Every S_i is an integer (map-side-combined
    BIGINT sum — the sketch is LINEAR, so partition/day/engine partials
    merge by addition), and the final mean/median arithmetic is
    fixed-order — the estimate is bit-identical everywhere.

    Returns one row: (f2_est DOUBLE, n_estimators BIGINT). Compare
    against the exact F2 to report sketch error (see the registered
    query); at 100 TB only the sketch is computable in one pass over
    an unbounded key domain."""
    est = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.explode(F.sequence(F.lit(0), F.lit(estimators - 1))).alias("i"),
    ).select(
        "i",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed), F.col("i").cast("string"),
                                   F.lit(":"), F.col("_k"))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint") % 2 * 2 - 1
        ).alias("sign"),
    )
    s = est.groupBy("i").agg(F.sum("sign").cast("bigint").alias("s"))
    means = (
        s.groupBy((F.col("i") / group_size).cast("int").alias("g"))
        .agg(
            (F.sum(F.col("s") * F.col("s")).cast("double") / F.lit(float(group_size)))
            .alias("m")
        )
    )
    n_groups = estimators // group_size
    w = Window.orderBy(F.col("m").asc())
    mid = means.select("m", F.row_number().over(w).alias("_rn")).filter(
        (F.col("_rn") == (n_groups + 1) // 2) | (F.col("_rn") == (n_groups + 2) // 2)
    )
    return mid.agg(
        F.avg("m").alias("f2_est"),
        F.lit(estimators).cast("bigint").alias("n_estimators"),
    )


def kmv_jaccard_pairs(
    df: DataFrame,
    col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set-similarity estimate between every pair of groups
    (Beyer et al. SIGMOD'07 / the theta-sketch Jaccard): for groups A
    and B, take the k smallest hashes of their UNION (which is just
    the merged per-group KMV states re-cut at k — the mergeability the
    sketch exists for) and count how many of those union samples lie
    in BOTH sets; that fraction is an unbiased estimate of
    |A∩B|/|A∪B|. The per-group states are the module's md5-derived
    integer hashes, so the estimate — not just the exact check — is
    reproducible on any engine.

    Scale: per-group state is k rows regardless of input (the ONE
    data-sized pass is kmv_hashes' map-side-combined distinct); all
    pair work happens on the groups²-by-k sketch relation. The exact
    Jaccard computed alongside is the oracle gate — at 100 TB you keep
    the estimate and drop the exact branch. Returns
    (group_a, group_b, inter_k, union_k, kmv_jaccard, n_inter,
    exact_jaccard)."""
    sk = kmv_hashes(df, col, k=k, by=[group_col]).select(
        F.col(group_col).alias("_g"), "h"
    )
    groups = sk.select("_g").distinct()
    pairs = (
        groups.select(F.col("_g").alias("ga"))
        .crossJoin(groups.select(F.col("_g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    left = pairs.join(sk.withColumnRenamed("_g", "ga"), "ga").select(
        "ga", "gb", "h", F.lit(1).alias("_ia"), F.lit(0).alias("_ib")
    )
    right = pairs.join(sk.withColumnRenamed("_g", "gb"), "gb").select(
        "ga", "gb", "h", F.lit(0).alias("_ia"), F.lit(1).alias("_ib")
    )
    u = (
        left.unionByName(right)
        .groupBy("ga", "gb", "h")
        .agg(F.max("_ia").alias("_ia"), F.max("_ib").alias("_ib"))
    )
    w = Window.partitionBy("ga", "gb").orderBy(F.col("h").asc())
    union_k = (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("union_k"),
            F.sum(F.col("_ia") * F.col("_ib")).cast("bigint").alias("inter_k"),
        )
    )
    d = df.select(F.col(group_col).alias("_g"), F.col(col).alias("_v")).distinct()
    sizes = d.groupBy("_g").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    inter = (
        d.select(F.col("_g").alias("ga"), "_v")
        .join(d.select(F.col("_g").alias("gb"), "_v"), "_v")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    out = (
        union_k.join(inter, ["ga", "gb"], "left")
        .join(F.broadcast(sizes.select(F.col("_g").alias("ga"), F.col("_n").alias("_na"))), "ga")
        .join(F.broadcast(sizes.select(F.col("_g").alias("gb"), F.col("_n").alias("_nb"))), "gb")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "inter_k",
            "union_k",
            (F.col("inter_k").cast("double") / F.col("union_k").cast("double"))
            .alias("kmv_jaccard"),
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("bigint").alias("n_inter"),
            (
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("_na") + F.col("_nb") - F.coalesce(F.col("n_inter"), F.lit(0))).cast("double")
            ).alias("exact_jaccard"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Deterministic KLL-family quantile compactor (the Munro-Paterson /
# derandomized-KLL member of the family; closes the r16/r17 KLL slot)
# ---------------------------------------------------------------------------

def _kll_parity(level_col) -> F.Column:
    """The compaction 'coin flip', seeded from md5 like every sketch in
    this module (KLL randomizes it; Munro-Paterson fixes it — here it
    is a deterministic function of the LEVEL only, so two engines, two
    partition layouts, and two merge branches all flip the same coin):
    bit = md5("kll|<level>") mod 2."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kll|"), level_col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )


def _kll_compact_round(st: DataFrame, k: int, by: list[str]) -> DataFrame:
    """One synchronous compaction round over a (by..., level, v, h)
    state: every (group, level) cell holding MORE than k items compacts
    — sort the whole cell by (v, h), keep the alternating positions the
    level's md5 parity selects, promote survivors to level+1 (weight
    doubles) — and every cell within capacity passes through untouched.
    A full-cell compaction of equal-weight-w items introduces at most w
    rank error for ANY query point (the classic alternating-halves
    bound), which is what makes the final guarantee deterministic."""
    cw = Window.partitionBy(*[F.col(c) for c in by], F.col("level"))
    ws = Window.partitionBy(*[F.col(c) for c in by], F.col("level")).orderBy(
        F.col("v").asc(), F.col("h").asc()
    )
    g = (
        st.withColumn("_n", F.count(F.lit(1)).over(cw))
        .withColumn("_pos", F.row_number().over(ws))
    )
    return (
        g.filter(
            (F.col("_n") <= k)
            | ((F.col("_pos") - 1) % 2 == _kll_parity(F.col("level")))
        )
        .select(
            *by,
            F.when(F.col("_n") > k, F.col("level") + 1)
            .otherwise(F.col("level"))
            .cast("int")
            .alias("level"),
            "v",
            "h",
        )
    )


def kll_state(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    k: int = 64,
    by: list[str] | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """Deterministic KLL-family quantile-sketch state: (by..., level,
    v, h), each row carrying weight 2^level.

    This is the DISTRIBUTION-INDEPENDENT-guarantee member of the
    family the r17 ``quantile_sample_state`` (bottom-k-by-hash, rank
    error O(sqrt(q(1-q)/k)) SAMPLING error) deliberately traded away:
    a Munro-Paterson 1980-style full-level compactor — KLL
    (Karnin-Lang-Liberty, FOCS 2016) with the coin flips derandomized
    to an md5 bit per level (``_kll_parity``), which is exactly what
    makes the state a pure function of the input MULTISET: no
    insertion-order or partition-layout dependence, so two engines
    produce bit-identical states and the sketch is value-oracled like
    everything else in this module.

    Algorithm: level 0 = all rows; each round, every (group, level)
    cell with more than k items compacts as a whole (sort by (v, h),
    keep the md5-parity alternation, promote to level+1); rounds
    repeat until no cell overflows (a 2-scalar convergence probe per
    round, the hyperball discipline). In a single batch pass each
    level compacts at most once, so the total rank error is at most
    sum(2^t, t < T) = 2^T - 1 with T the final level, and 2^T < 2n/k
    — a DETERMINISTIC eps ~ 2/k rank guarantee, no distribution or
    probability qualifier. Space: at most k items per occupied level,
    <= k * (T + 1) per group.

    Scale: the only data-sized operation is round 1's per-(group,
    level-0) sort — executed as a hash-partitioned window, and at
    100 TB the same two-level salt split ``quantile_sample_state``
    uses applies (compact per salt bucket first, then compact the
    survivors: each salt cell is a valid equal-weight compaction, so
    the guarantee composes — per-compaction error stays <= its
    weight). Every later round touches <= n/2^t rows. Merge:
    ``kll_merge``; estimates: ``kll_quantile_values``."""
    by = by or []
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    st = df.select(
        *by,
        F.lit(0).cast("int").alias("level"),
        F.col(value_col).alias("v"),
        h.alias("h"),
    )
    return _kll_compact_to_fixpoint(st, k, by, max_rounds)


def _kll_compact_to_fixpoint(
    st: DataFrame, k: int, by: list[str], max_rounds: int
) -> DataFrame:
    """Run compaction rounds to the no-overflow fixpoint.

    Rounds are unrolled in ADAPTIVELY-SIZED blocks inside one lazy plan
    between driver synchronizations. A compaction round at or past the
    fixpoint is a pure pass-through (every cell holds <= k items, so
    the filter keeps every row and the level expression is the
    identity), so overshooting the fixpoint inside a block cannot
    change the state — the result is bit-identical to the one-round-
    at-a-time loop, which paid TWO driver-synchronized jobs per round
    (a convergence probe + an eager localCheckpoint: ~2·rounds
    scheduler round-trips; sketch_kll_merged_days measured 15.8 s wall
    vs 2.6 s CPU at sf0.1 under that shape).

    Block sizing: the max-cell probe that answers "converged?" also
    returns HOW overloaded the worst cell is, and a cell of n items
    shrinks ~2x per compaction, so ceil(log2(n/k)) rounds is the
    expected distance to the fixpoint — the r18-interim fixed block of
    8 unrolled 16 window passes for states that needed 3 (each round
    is an exchange + sort even when it passes through). Promotions
    cascading into already-occupied levels can exceed the estimate;
    the probe loop supplies the shortfall (undershoot = one more
    block, overshoot = pass-through rounds — both result-identical).
    Per block there is exactly ONE action: the probe runs over the
    lazily checkpoint-marked state, so the same job that answers
    "converged?" also materializes the block's output and truncates
    lineage (LocalRDDCheckpointData persists partitions as the probe
    computes them). The extra up-front probe on the raw state is one
    map-side-combined count aggregation per group — and for an
    already-converged state (merges of few small sketches) it is the
    ONLY job, where the fixed block paid 16 window passes to learn
    there was nothing to do."""

    def _max_cell(s: DataFrame) -> int:
        # a SCALAR aggregate, not filter().isEmpty(): isEmpty is a
        # limit(1), which Spark executes as incremental partial-
        # partition jobs (1, then 4x more, ...) — several driver
        # round-trips to conclude "empty" on a converged state — and a
        # partial evaluation would also leave the lazy checkpoint's
        # remaining partitions to a separate fill job. The max-cell
        # aggregate computes every partition in exactly ONE job.
        mx = (
            s.groupBy(*by, "level")
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("_m"))
            .collect()[0]["_m"]
        )
        return mx or 0

    rounds = 0
    mx = _max_cell(st)
    while mx > k and rounds < max_rounds:
        n = min(max(1, math.ceil(math.log2(mx / k))), max_rounds - rounds)
        for _ in range(n):
            st = _kll_compact_round(st, k, by)
        st = st.localCheckpoint(eager=False)
        rounds += n
        mx = _max_cell(st)
    return st


def kll_merge(
    states: DataFrame,
    k: int = 64,
    by: list[str] | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """Merge KLL states (the plain union of any number of
    ``kll_state`` outputs): re-run the same compaction loop on the
    combined rows. Cells that still fit pass through; overflowing
    cells compact with the SAME md5 parity their level always uses,
    so the merge is commutative bit-for-bit (the union multiset is
    symmetric and every compaction is a pure function of cell
    content).

    Unlike the hash-structured sketches (KMV, HLL, bottom-k sample),
    the merged state is NOT bit-identical to a single pass over the
    combined data — no rank-structured summary can be, because each
    branch already discarded different items. What merging preserves
    is the GUARANTEE: each branch contributes its own <= 2^T_branch-1
    error and each post-union compaction at level t adds <= 2^t, so
    the merged estimate stays within 2^(T+1) ranks (T = final max
    level) — the property ``test_kll_merge_rank_error_within_bound``
    pins across adversarial splits. This is the same trade Apache
    DataSketches' KLL makes; the bit-mergeable twin remains
    ``quantile_sample_state``."""
    by = by or []
    return _kll_compact_to_fixpoint(
        states.select(*by, "level", "v", "h"), k, by, max_rounds
    )


def kll_quantile_values(
    state: DataFrame,
    qs: list[float],
    by: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a KLL state: rows weighted 2^level,
    ranked by (v, h) — fully deterministic — and for each q the
    estimate is the first row whose cumulative weight reaches
    max(1, ceil(q * W)). Returns (by..., q, n_state, w_total,
    final_level, err_bound, value, value_h):

    - ``err_bound`` = 2^(T+1) ranks (T = final_level): the analytic
      deterministic envelope — single-pass compaction error is
      <= 2^T - 1, and the odd-cell weight drift plus the ceil target
      discrepancy stay under another 2^T. No probability qualifier.
    - ``value_h`` rides along so callers can measure the estimate's
      TRUE rank in the base relation under the same (v, h) total
      order (the registered query reports that measured rank error
      next to the bound and the exact same-rule quantile)."""
    by = by or []
    w_val = F.pow(F.lit(2.0), F.col("level")).cast("bigint")
    ws = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy(
        F.col("v").asc(), F.col("h").asc()
    )
    cw = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)])
    ranked = (
        state.select(*by, "level", "v", "h", w_val.alias("_w"))
        .withColumn(
            "_cw",
            F.sum("_w").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_wt", F.sum("_w").over(cw))
        .withColumn("_s", F.count(F.lit(1)).over(cw))
        .withColumn("_T", F.max("level").over(cw))
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    tgt = F.greatest(
        F.lit(1).cast("bigint"), F.ceil(F.col("q") * F.col("_wt")).cast("bigint")
    )
    return (
        ranked.select(
            *by, "v", "h", "_w", "_cw", "_wt", "_s", "_T",
            F.explode(qarr).alias("q"),
        )
        .filter((F.col("_cw") >= tgt) & (F.col("_cw") - F.col("_w") < tgt))
        .select(
            *by,
            "q",
            F.col("_s").cast("bigint").alias("n_state"),
            F.col("_wt").cast("bigint").alias("w_total"),
            F.col("_T").cast("bigint").alias("final_level"),
            F.pow(F.lit(2.0), F.col("_T") + 1).cast("bigint").alias("err_bound"),
            F.col("v").alias("value"),
            F.col("h").alias("value_h"),
        )
    )


def kmv_difference(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: int = 64,
) -> DataFrame:
    """KMV/theta-sketch set-difference estimate |A \\ B| (the
    A-not-B operation of the theta-sketch family — Dasgupta et al.,
    "Theta-Sketch Framework", and the audience-analytics twin of
    ``kmv_jaccard_pairs``): from the two per-set KMV states alone,
    estimate how many distinct values of A are absent from B — e.g.
    "users who clicked but never hit an error" without rescanning
    either side.

    With theta = min(theta_A, theta_B) (each side's k-th smallest
    hash, or the full 2^60 space when the state holds the whole set —
    the exact regime), every retained A-hash below theta is a uniform
    sample of A, and B's state provably contains ALL of B's hashes
    below theta, so membership checks against it are exact within the
    sample. The estimate is ``|{h ∈ S_A : h < theta, h ∉ S_B}| · 2^60
    / theta`` — in the exact regime the multiplier collapses to 1 and
    the estimate IS the exact difference. Hash space and counts are
    exactly-representable doubles (the ``kmv_estimate`` contract), so
    the estimate is bit-identical cross-engine.

    Scale: the two data-sized passes are kmv_hashes' map-side
    distincts; everything after runs on ≤k-row sketch relations
    (1-row totals broadcast, sketch-sized anti join). The exact
    difference computed alongside is the oracle gate — at 100 TB you
    keep the estimate and drop the exact branch. Returns one row:
    (n_state_a, n_state_b, theta, n_kept, kmv_diff_estimate,
    exact_diff, rel_err).
    """
    space = 1 << 60
    # presalt: the ungrouped bottom-k would otherwise single-partition
    # the whole distinct-hash set (see kmv_hashes docstring)
    sa = kmv_hashes(df_a, col, k=k, presalt=32)
    sb = kmv_hashes(df_b, col, k=k, presalt=32)
    ta = sa.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state_a"),
        F.when(F.count(F.lit(1)) < k, F.lit(space))
        .otherwise(F.max("h"))
        .cast("bigint")
        .alias("theta_a"),
    )
    tb = sb.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_state_b"),
        F.when(F.count(F.lit(1)) < k, F.lit(space))
        .otherwise(F.max("h"))
        .cast("bigint")
        .alias("theta_b"),
    )
    th = ta.crossJoin(tb).select(
        "n_state_a",
        "n_state_b",
        F.least("theta_a", "theta_b").alias("theta"),
    )
    kept = (
        sa.select("h")
        .crossJoin(F.broadcast(th.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .join(sb.select("h"), "h", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    exact = (
        df_a.select(F.col(col).alias("_v"))
        .distinct()
        .join(df_b.select(F.col(col).alias("_v")).distinct(), "_v", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_diff"))
    )
    # theta is a positive hash with probability 1 - 2^-60; the guard
    # keeps the pathological zero-hash draw an empty estimate instead
    # of an ANSI divide-by-zero
    est = F.when(
        F.col("theta") > 0,
        F.col("n_kept").cast("double")
        * F.lit(float(space))
        / F.col("theta").cast("double"),
    )
    return (
        th.crossJoin(kept)
        .crossJoin(exact)
        .select(
            "n_state_a",
            "n_state_b",
            "theta",
            "n_kept",
            est.alias("kmv_diff_estimate"),
            "exact_diff",
            F.when(
                F.col("exact_diff") > 0,
                F.round(
                    F.abs(est - F.col("exact_diff").cast("double"))
                    / F.col("exact_diff").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rel_err"),
        )
    )
