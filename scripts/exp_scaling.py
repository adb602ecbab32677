"""Weak-scaling experiment: measure headline operators at 1x / 3x / 10x
the sf0.1 data volume on the same local[32] session, to check the
shapes SCALE.md claims — near-linear cost for scan/agg/window ops,
bounded superlinearity for the bucketed pair generators.

Scaled tables are synthesized from sf0.1 by replicating rows with
per-copy key offsets (users, orders, doc ids) so the WORKLOAD scales
weakly: 10x documents with 10x distinct contents (every word of copy
k carries an `xk` suffix, so copies share ZERO word shingles — an
earlier word-ROTATION scheme left ~(1 - k/54) shingle overlap on the
54-word average doc, i.e. every doc had 9 synthetic near-dup copies,
which inflated every MinHash/Jaccard/components measurement), 10x
events over 10x users with the same per-user series length. Results
print as a markdown table for SCALE.md §9.

Usage: python scripts/exp_scaling.py [factors...]   (default 1 3 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from refluxdb_spark.queries import QUERIES  # noqa: E402
from refluxdb_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/refluxdb_spark_scaling"

def _rp_lsh_prod(spark, sf_dir):
    """rp_lsh_pairs in its PRODUCTION sizing (band_bits=None →
    log2(N/32)-bit bands): with the width fixed, 10x vectors makes
    every bucket 10x and the per-band quadratic 100x (measured 11.7x
    wall at 10x with the old pinned 4-bit bands); log2(N) sizing keeps
    the expected bucket at ~32 vectors, so candidate cost grows ~N.
    The measurement checks that bound."""
    from refluxdb_spark.operators import similarity as S
    from refluxdb_spark.queries import load

    return S.rp_lsh_pairs(load(spark, sf_dir, "embeddings"), threshold=0.35)


def _semantic_prune_prod(spark, sf_dir):
    """semantic_prune in its PRODUCTION sizing (num_centroids=None →
    √N cells), not the oracled query's pinned 16 cells: with the cell
    count fixed, 10x vectors makes every cell 10x and the per-cell
    quadratic 100x — measuring that would grade the determinism pin,
    not the operator. √N sizing keeps cells ~√N, so total pair cost
    grows ~N^1.5 worst-case; the measurement checks that bound."""
    from refluxdb_spark.operators import similarity as S
    from refluxdb_spark.queries import load

    return S.semantic_prune(load(spark, sf_dir, "embeddings"), threshold=0.35)


# Later x30 tiers (SCALE.md §9): every bench query priced above
# ~0.5s at sf0.1, plus the full graph family. Run with
# `python scripts/exp_scaling.py --tier N 1 30`; tier 1 is MEASURED.
TIERS: dict[int, list[str]] = {
    2: [
        "dedup_components", "pipeline_corpus_end_to_end",
        "dedup_incremental_pairs", "text_boilerplate_removal",
        "ts_autocorrelation", "sim_pq_adc_topk", "dedup_source_overlap",
        "pipeline_vector_end_to_end", "tpch_q2_min_cost_supplier",
        "events_funnel_windowed",
    ],
    3: [
        "dedup_decontaminate", "sim_ivf_topk", "sim_ivf_quantized_topk",
        "sim_centroid_classify", "tpch_q8_market_share",
        "ts_anomaly_zscore", "tpch_q5_local_supplier_volume",
        "orders_open_backlog_daily", "text_langid_confusion",
        "skew_salted_join_counts", "text_tfidf_top_terms",
        "tpch_q18_large_volume_orders",
    ],
    4: [
        "tpch_q3_shipping_priority", "tpch_q9_product_type_profit",
        "dedup_shared_chunks", "pipeline_rag_end_to_end",
        "pipeline_chunk_dedup", "text_pmi_pairs", "text_unigram_logprob",
        "sketch_hll_intersection", "events_bot_signals",
        "sim_hard_negatives", "sim_ivf_append_topk", "ts_winsorized_stats",
    ],
    5: [  # graph family (nation graphs collapse to <=600 edges; parts
        # graphs carry factor-sized edge relations through iterations)
        "graph_pagerank_nations", "graph_triangles_nations",
        "graph_link_prediction_nations", "graph_link_ra_nations",
        "graph_degree_distribution", "graph_bfs_depths_trade",
        "graph_kcore_parts", "graph_communities_parts",
        "graph_assortativity_parts", "events_markov_stationary",
    ],
    6: [  # r16 additions: position-gram span dedup (grams ∝ tokens;
        # the word-suffix scheme keeps cross-copy 6-grams disjoint, so
        # dup positions scale ~linearly), Gopher repetition fractions,
        # DSIR (bucket table is fixed 1024 rows at every factor), BM25
        # (tf rows ∝ docs x |terms|), per-language LM bucketing
        "dedup_exact_substr_spans", "text_dup_ngram_chars",
        "text_top_ngram_fraction", "sample_dsir_select",
        "text_bm25_scores", "text_perplexity_buckets",
    ],
    7: [  # r16 batch 3-5: real-decode map ops (payload build + decode
        # beside the scan), span decontamination (eval grams broadcast),
        # PSI (category-sized), KMV jaccard (k-row states), harmonic
        # centrality (node-fixed graph; cost is the edge extraction),
        # DB index (centroid-dim pairwise)
        "mm_audio_stdlib_decode", "mm_keyframe_select",
        "mm_png_stdlib_decode", "mm_vad_segments",
        "dedup_decontaminate_spans", "events_psi_drift",
        "sketch_kmv_jaccard", "graph_harmonic_trade",
        "sim_cluster_db_index",
    ],
    8: [  # r17: HyperBall — the registry query runs on the node-FIXED
        # trade graph (cost is the edge extraction); the production
        # probe below runs on the factor-sized co-purchase part graph,
        # where the exact all-pairs form would be node²-bounded and
        # the register-bounded claim is the thing under test
        "graph_harmonic_hyperball", "graph_lin_hyperball",
        ("hyperball_parts_prod", "lineitem", "_hyperball_parts_prod"),
        # r17: two-level bottom-k sketch — level 1 sorts salt slices,
        # level 2 sorts k*fanin rows; cost should track the scan
        "sketch_quantile_sample",
        # r17: truncated-dim cascade — stage-1 scan dominates, linear
        "sim_matryoshka_topk",
    ],
    9: [  # r18: KLL compactor (state <= k*levels per group; round-1
        # window is the data-sized pass), graph ANN (n² build + beam
        # search whose per-hop cost is queries x beam x m, corpus-
        # independent), and its recall harness (adds the exact side).
        # The OTHER r18 tier-9 axis — state vs key cardinality — is
        # scripts/exp_state_cardinality.py (SCALE.md §12).
        "sketch_kll_quantiles",
        "sim_hnsw_topk",
        "sim_hnsw_persisted_topk",
        "sim_hnsw_recall",
        # production probe: IVF-blocked graph build (sqrt-N cells)
        # instead of the oracled n² build — the declared scale path
        ("nsw_blocked_prod", "embeddings", "_nsw_blocked_prod"),
    ],
}


def _nsw_blocked_prod(spark, sf_dir):
    """nsw_topk with the graph built in its PRODUCTION sizing: m-NN
    scored WITHIN IVF cells (sqrt-N centroids, the default_num_centroids
    rule) instead of the n² cross join — the blocked build the
    nsw_graph docstring declares for 100 TB. Per-cell pair cost is
    ~N^1.5 worst-case with sqrt-N cells (the semantic_prune bound);
    the beam search on top stays O(queries x beam x m x hops)
    regardless of corpus size. The oracled queries keep the exact n²
    build (dimension-sized corpora, determinism pin); this probe
    measures the scale path."""
    from pyspark.sql import Window

    from refluxdb_spark.operators import similarity as S
    from refluxdb_spark.queries import load

    emb = load(spark, sf_dir, "embeddings")
    cents = S.default_num_centroids(emb.count())
    _, assigned = S.build_ivf_index(emb, cents)
    left = assigned.select(
        "centroid_id", F.col("vec_id").alias("src"),
        F.col("embedding").alias("_ev1"),
    )
    right = assigned.select(
        "centroid_id", F.col("vec_id").alias("dst"),
        F.col("embedding").alias("_ev2"),
    )
    scored = (
        left.join(right, "centroid_id")
        .filter(F.col("src") != F.col("dst"))
        .withColumn(
            "_sim",
            F.round(
                S._dot("_ev1", "_ev2") / (S._norm("_ev1") * S._norm("_ev2")), 6
            ),
        )
    )
    wm = Window.partitionBy("src").orderBy(
        F.col("_sim").desc(), F.col("dst").asc()
    )
    g = (
        scored.withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") <= 12)
        .select("src", "dst")
    )
    g = g.union(
        g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    qs = emb.filter(F.col("vec_id") < 10)
    return S.nsw_topk(emb, qs, k=5, beam=24, hops=4, graph=g)


def _hyperball_parts_prod(spark, sf_dir):
    """hyperball_harmonic over the FACTOR-SIZED co-purchase part graph
    (the graph_kcore_parts edge relation, symmetrized): per-node state
    is at most m=256 HLL registers regardless of how many parts reach
    it, so 10x parts should cost ~10x bytes — the exact all-pairs
    harmonic would carry a (root, node) relation growing with reachable
    PAIRS (the declared node² ceiling hyperball removes)."""
    from refluxdb_spark.operators import graph as G
    from refluxdb_spark.queries import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    und = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("_sup"))
        .filter(F.col("_sup") >= 2)
        .select("pa", "pb")
    )
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).union(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    return G.hyperball_harmonic(edges, max_depth=4, p=8)

# (query name, table the factor applies to, callable or None=QUERIES[name])
MEASURED = [
    ("tpch_q1_pricing_summary", "lineitem", None),
    ("ts_ema_per_user", "events", None),
    ("events_rolling_7d_actives", "events", None),
    ("dedup_minhash_lsh_pairs", "documents", None),
    ("sim_cosine_topk", "embeddings", None),
    # round-8 additions: the bench top-cost family (every one a
    # bucketed pair generator or ANN build — the plans whose 100x
    # behavior the capping/blocking machinery exists to bound)
    ("dedup_jaccard_pairs_capped", "documents", None),
    ("dedup_simhash_pairs_capped", "documents", None),
    ("string_fuzzy_title_pairs", "documents", None),
    ("sim_ivfpq_topk", "embeddings", None),
    ("semantic_prune_prod", "embeddings", _semantic_prune_prod),
    ("rp_lsh_prod", "embeddings", _rp_lsh_prod),
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# bump when the replication transforms change: a prebuilt dir from an
# older scheme (e.g. the rotation-based one) must rebuild, not silently
# feed mixed-scheme measurements
SCHEME_VERSION = "4-fixed-dims-single-copy"


def build_scaled(spark, factor: int) -> str:
    out = f"{WORK}/x{factor}"
    marker = f"{out}/.done"
    if os.path.exists(marker) and open(marker).read() == SCHEME_VERSION:
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if factor == 1 or t in ("nation", "region"):
            # nation/region are FIXED dims (25/5 rows at every SF, the
            # TPC-H contract): replicating them — even un-offset — put
            # `factor` duplicate rows behind every nationkey, so every
            # fact->nation join fanned out factor-fold (the x30 BFS
            # measured 65x from exactly this artifact)
            scaled = df
        else:
            copies = []
            for k in range(factor):
                c = df
                if t == "events":
                    c = (
                        c.withColumn("user_id", F.col("user_id") + F.lit(k * 10**7))
                        .withColumn("event_id", F.col("event_id") + F.lit(k * 10**12))
                    )
                elif t == "documents":
                    # suffix every word with the copy index: copies
                    # share zero word shingles (and few char n-grams),
                    # so shingle/MinHash/SimHash methods see 10x
                    # GENUINELY distinct docs, while within-copy dup
                    # structure is preserved (both sides of a dup pair
                    # get the same suffix)
                    c = c.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10**9))
                    if k:
                        toks = F.split(F.col("text"), " ")
                        tagged = F.transform(
                            toks, lambda w: F.concat(w, F.lit(f"x{k}"))
                        )
                        c = c.withColumn(
                            "text", F.array_join(tagged, " ")
                        ).withColumn("n_chars", F.length("text"))
                elif t == "embeddings":
                    c = c.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10**9))
                    if k:
                        # flip the sign of every dimension in copy k's
                        # BIT PATTERN: a unique orthogonal transform per
                        # copy up to factor 65536 (the earlier single
                        # dim-(k%16) flip made copies 1 and 17 exact
                        # duplicates, capping honest factors at 16)
                        flips = [d for d in range(16) if (k >> d) & 1]
                        c = c.withColumn(
                            "embedding",
                            F.transform(
                                "embedding",
                                lambda x, i: F.when(
                                    i.isin(flips), -x
                                ).otherwise(x),
                            ),
                        )
                elif t == "lineitem":
                    # offset FK keys in lockstep with their dimensions:
                    # leaving a dimension un-offset while replicating it
                    # makes every fact->dim join fan out k-fold (10x
                    # copies of each customer matched 10x orders = 100x
                    # join output at x10 — a synthetic artifact, not a
                    # plan cost; the nation-graph edge extraction
                    # measured ~1000x intermediate rows before this fix)
                    c = (
                        c.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 10**9))
                        .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * 10**9))
                        .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * 10**9))
                    )
                elif t == "orders":
                    c = (
                        c.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * 10**9))
                        .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 10**9))
                    )
                elif t == "customer":
                    c = c.withColumn("c_custkey", F.col("c_custkey") + F.lit(k * 10**9))
                elif t == "supplier":
                    c = c.withColumn("s_suppkey", F.col("s_suppkey") + F.lit(k * 10**9))
                elif t == "part":
                    c = c.withColumn("p_partkey", F.col("p_partkey") + F.lit(k * 10**9))
                # nation/region stay un-offset: genuinely fixed dims
                # (25/5 rows at every SF, the TPC-H contract)
                copies.append(c)
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    with open(marker, "w") as fh:
        fh.write(SCHEME_VERSION)
    return out


def main() -> None:
    args = sys.argv[1:]
    measured = MEASURED
    if args[:1] == ["--tier"]:
        # tier 1 IS the default MEASURED set (kept as the richer
        # (name, table, callable) form because it includes the
        # production-sized variants not registered in QUERIES)
        # tier 1 = MEASURED; the rest come from TIERS
        if (len(args) < 2 or not args[1].isdigit()
                or int(args[1]) not in {1, *TIERS}):
            print(f"error: --tier requires one of {sorted({1, *TIERS})}",
                  file=sys.stderr)
            sys.exit(2)
        tier = int(args[1])
        if tier == 1:
            measured = MEASURED
        else:
            # tier entries are registry-query names, or (name, table,
            # "_callable_name") tuples for production-sized probes not
            # registered in QUERIES (resolved here because TIERS is
            # defined above the probe functions)
            measured = [
                (q[0], q[1], globals()[q[2]]) if isinstance(q, tuple)
                else (q, "", None)
                for q in TIERS[tier]
            ]
        args = args[2:]
    # reject unknown --flags and non-integer factors with usage, not a
    # traceback through int() (same class as the bench_compare fix)
    unknown = [a for a in args if a.startswith("--")]
    if unknown:
        # a late --tier is position-, not name-, invalid: say so instead
        # of the self-contradictory "unknown: --tier (known: --tier)"
        # (ADVICE r15)
        if "--tier" in unknown:
            print("error: --tier must be the first argument "
                  "(usage: exp_scaling.py [--tier N] [factors...])",
                  file=sys.stderr)
        else:
            print(f"error: unknown flag(s): {' '.join(unknown)} "
                  f"(known: --tier)", file=sys.stderr)
        sys.exit(2)
    try:
        factors = [int(a) for a in args] or [1, 3, 10]
    except ValueError as e:
        print(f"error: factors must be integers ({e})", file=sys.stderr)
        sys.exit(2)
    if any(f < 1 for f in factors):
        print(f"error: factors must be >= 1, got {factors}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark(app_name="refluxdb_spark_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {q: {} for q, _t, _f in measured}
    for f in factors:
        sf_dir = build_scaled(spark, f)
        for q, _tbl, custom in measured:
            fn = custom or QUERIES[q]
            fn(spark, sf_dir).count()  # warm
            samples = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            samples.sort()
            results[q][f] = round(samples[1], 2)
            print(f"# x{f} {q}: {results[q][f]}s {samples}", file=sys.stderr)
    base = factors[0]
    print("| query | " + " | ".join(f"x{f}" for f in factors)
          + f" | x{factors[-1]}/x{base} cost ratio |")
    print("|---|" + "---|" * (len(factors) + 1))
    for q, _t, _f in measured:
        r = results[q]
        ratio = round(r[factors[-1]] / r[base], 1) if r[base] else float("nan")
        print(f"| {q} | " + " | ".join(f"{r[f]}s" for f in factors)
              + f" | {ratio}x |")


if __name__ == "__main__":
    main()
