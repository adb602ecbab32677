"""Graph analytics over relations: integer-exact PageRank.

The reference stores no graphs (its tables are flat timeseries,
``persistence.rs:35``), but a training-data pipeline does: document
link/containment graphs, user-interaction graphs, entity co-occurrence.
``dedup.connected_components`` covers the clustering side; this module
adds importance ranking.

Determinism design: classic PageRank sums doubles, and double sums are
shuffle-order-dependent — the same graph can rank differently run to
run once ranks tie within an ulp. Here every rank is a scaled BIGINT
(``scale`` = 1e12 by default) and every step is integer arithmetic
(``div``, ``*``, ``+``, exact BIGINT sums), so two engines — or two
cluster layouts — produce the IDENTICAL fixpoint trajectory. That is
what makes the operator oracle-testable (the DuckDB oracle unrolls the
same integer recurrence) and its results reproducible at 100 TB.

Scale shape: the rank table is node-sized, the edge table is the big
relation. Each iteration broadcasts ranks onto the edge scan (no edge
shuffle to pick up ranks) and runs ONE map-side-combined aggregation
keyed by dst — per-iteration cost is a scan of edges plus a shuffle of
at most |nodes| combined rows. Lineage is cut per iteration with an
eager localCheckpoint, so 50 iterations do not build a 50-deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint: bool = True,
    checkpoint_interval: int = 8,
) -> DataFrame:
    """Integer-exact PageRank over a (src, dst) edge relation.

    Recurrence (all BIGINT, truncating division)::

        init       = scale div N
        base       = (100 - damping_pct) * init div 100
        contrib(v) = sum over in-edges (u, v) of  r(u) div outdeg(u)
        r'(v)      = base + damping_pct * contrib(v) div 100

    Dangling mass (nodes with no out-edges) leaks, as in the original
    formulation — deterministic either way. Returns
    ``(node, rank_scaled BIGINT)``; divide by ``scale`` for the usual
    [0, 1] reading.

    The node count is a driver-side scalar (``count()``): the node
    relation is metadata-sized next to edges (the same contract as
    ``similarity.train_kmeans_centroids`` collecting k centroids).
    """
    n_col = F.col("n")
    # The edge relation feeds four consumers (nodes, deg, and every
    # iteration's scan): persist it for the operator's lifetime so a
    # derived edge set (joins upstream) is built once, not per
    # consumer. Memory-and-disk, released before return — the final
    # ranks are eagerly checkpointed first, so nothing recomputes
    # through it. At warehouse scale the durable form of this reuse is
    # a materialized edge table; the persist covers the derived case.
    cache_edges = checkpoint and iterations > 0
    if cache_edges:
        edges = edges.persist()
    # node-sized: checkpoint once so the per-iteration left join and the
    # count below don't each re-scan the edge relation to re-derive it
    nodes = (
        edges.select(F.col(src).alias("n"))
        .union(edges.select(F.col(dst).alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        if cache_edges:
            edges.unpersist()
        return nodes.withColumn("rank_scaled", F.lit(0).cast("bigint")).select(
            n_col.alias("node"), "rank_scaled"
        )
    init = scale // n_nodes
    base = ((100 - damping_pct) * init) // 100

    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    # outdeg rides the edge rows via a broadcast of the node-sized deg
    # relation — the edge table is never shuffled to learn its degree
    e = edges.select(src, dst).join(F.broadcast(deg), src)

    ranks = nodes.select("n", F.lit(init).cast("bigint").alias("r"))
    for it in range(iterations):
        contrib = (
            e.join(F.broadcast(ranks), e[src] == ranks["n"])
            .select(
                F.col(dst).alias("n"),
                F.expr("r div outdeg").alias("c"),
            )
            .groupBy("n")
            .agg(F.sum("c").alias("s"))
        )
        # contrib is node-sized too — broadcast keeps the whole
        # iteration free of sort-merge machinery
        ranks = nodes.join(F.broadcast(contrib), "n", "left").select(
            "n",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(s, 0L) div 100")
            ).cast("bigint").alias("r"),
        )
        if checkpoint and (it + 1) % checkpoint_interval == 0:
            # cut lineage every few rounds (node-sized relation, so the
            # cut is cheap) — checkpointing EVERY round costs a full
            # job per iteration, which dominates on small graphs; pass
            # checkpoint=False to keep the whole plan for audit
            ranks = ranks.localCheckpoint(eager=True)
    if checkpoint:
        # materialize the final ranks BEFORE releasing the edge cache:
        # the un-checkpointed tail of the loop still reads through it
        ranks = ranks.localCheckpoint(eager=True)
    if cache_edges:
        edges.unpersist()
    return ranks.select(n_col.alias("node"), F.col("r").alias("rank_scaled"))


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count + clustering coefficient over an
    undirected graph given as a (src, dst) edge relation (direction
    and duplicates ignored; self-loops dropped).

    Node-iterator++ (Schank & Wagner 2005) shape: every edge is
    oriented from its lower-(degree, node) endpoint to the higher —
    each wedge and each triangle is then generated EXACTLY once, and
    the join fan-out per node is bounded by its oriented out-degree
    (O(sqrt(|E|)) on skew-free graphs, and the heavy hubs become join
    *probe* sides, not build sides). The count is orientation-invariant
    so the oracle may count canonically (a<b<c) instead.

    Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    global_clustering = 3T/W). Wedge count comes from the exact
    integer degree sum, clustering is one int/int double division.

    Scale: degrees are a node-sized aggregate broadcast onto the edge
    scan; the wedge self-join keys on the oriented source and the
    closing check is a semi-join back to the edge set — never a node
    cross-product.
    """
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient a->b when (d_a, a) < (d_b, b): total order, no ties
    e = (
        und.join(F.broadcast(deg.select(F.col("n").alias("a"), F.col("d").alias("da"))), "a")
        .join(F.broadcast(deg.select(F.col("n").alias("b"), F.col("d").alias("db"))), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("_e")
        )
        .select("_e.u", "_e.v")
    )
    w1 = e.select(F.col("u"), F.col("v").alias("x"))
    w2 = e.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        und.select(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        ),
        ["x", "y"],
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = und.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    return (
        nodes.crossJoin(stats)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("global_clustering"),
        )
    )


def common_neighbor_link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 20,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction by common-neighbor count: for every NON-adjacent
    node pair, how many neighbors they share — the classic baseline
    (Liben-Nowell & Kleinberg 2003) for "who should be connected next".

    Wedge generation through each shared neighbor (one self-join of the
    symmetric adjacency list on the center node), aggregated per
    candidate pair, with existing edges anti-joined away; top-k by
    (count desc, pair) is fully tiebroken.

    Scale: wedge fan-out is Σ d(u)² — ``max_degree`` drops hub centers
    above the cap BEFORE the self-join (the same hot-bucket discipline
    as LSH's ``max_bucket``: a celebrity node contributing d² wedge
    pairs swamps any reducer, and its common-neighbor evidence is the
    least informative). Capped, per-center cost is bounded by
    max_degree²; the pair aggregation is map-side combined.
    """
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbrs = und.select(F.col("a").alias("u"), F.col("b").alias("n")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("n"))
    )
    if max_degree is not None:
        deg = nbrs.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        nbrs = nbrs.join(
            F.broadcast(deg.filter(F.col("d") > max_degree).select("u")),
            "u",
            "left_anti",
        )
    w1 = nbrs.select("u", F.col("n").alias("x"))
    w2 = nbrs.select("u", F.col("n").alias("y"))
    cand = (
        w1.join(w2, "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .join(und.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_anti")
    )
    return (
        cand.orderBy(F.desc("common_neighbors"), "x", "y")
        .limit(k)
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "common_neighbors",
        )
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed to each
    reachable node, bounded by ``max_depth`` — reachability layering
    (crawl-frontier expansion, citation-depth attribution, blast-radius
    analysis) over an edge relation.

    Frontier expansion, not matrix powering: each round joins the
    CURRENT frontier (nodes first reached last round) against the edge
    table, anti-joins the visited set, and stamps the new nodes with
    the round number — by induction that stamp IS the minimum depth,
    so no min-aggregation over all walks is ever materialized (the
    walk space is exponential; the visited set is node-bounded).

    Scale shape: the frontier and visited relations are node-sized and
    ride broadcast joins onto the edge scan — the edge table (the 100
    TB side) is never shuffled; per round costs one edge scan + one
    node-sized distinct. Lineage is cut each round with an eager
    localCheckpoint (same contract as ``pagerank``). Early-exits when
    the frontier empties, so ``max_depth`` is a diameter bound, not a
    cost floor.

    Like ``pagerank``, the edge relation is persisted for the loop's
    lifetime: every round scans it, and a DERIVED edge set (a join
    pipeline upstream, e.g. fact->dim extraction) would otherwise
    re-execute per round — measured 17x instead of ~linear at 10x
    data for the nation-trade BFS before this persist (the durable
    form at warehouse scale is a materialized edge table; the persist
    covers the derived case, and is a no-op read-through for a
    parquet-backed input).

    Returns ``(node, depth BIGINT)`` — seeds at depth 0, unreachable
    nodes absent. The reference has no graph surface (its tables are
    flat series, persistence.rs:35); this is north-star pipeline
    tooling."""
    edges = edges.persist()
    visited = (
        seeds.select(F.col("node"), F.lit(0).cast("bigint").alias("depth"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", src)), src
            )
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(F.broadcast(visited.select("node")), "node", "left_anti")
            .select("node", F.lit(d).cast("bigint").alias("depth"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    # every row of `visited` is already eagerly checkpointed (each
    # round's union materialized before the next), so nothing
    # recomputes through the released cache
    edges.unpersist()
    return visited


def stationary_distribution(
    transitions: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "n",
    iterations: int = 8,
    scale: int = 10**12,
) -> DataFrame:
    """Stationary distribution of a weighted Markov chain by
    integer-exact power iteration — where do user journeys settle,
    given the observed transition counts? The Markov twin of
    ``pagerank`` (no damping, row-stochastic weights from counts).

    Recurrence (all BIGINT, truncating division)::

        init   = scale div N
        r'(j)  = Σ_i  (r(i) * w(i,j)) div out(i)

    with out(i) = Σ_j w(i,j). States without outgoing transitions
    absorb their mass (it leaks, deterministically — same contract as
    pagerank's dangling nodes). Integer arithmetic makes the whole
    trajectory engine-identical, so the oracle can unroll the same
    recurrence.

    Scale shape: the state set is category-sized (event types, page
    ids); every join broadcasts the state-sized rank/out relations
    onto the transition relation. Returns (state, mass_scaled BIGINT);
    divide by ``scale`` for probabilities."""
    t = transitions.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"),
        F.col(weight).cast("bigint").alias("_w"),
    ).persist()
    states = (
        t.select(F.col("_s").alias("state"))
        .union(t.select("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = states.count()
    if n == 0:
        t.unpersist()
        return states.withColumn("mass_scaled", F.lit(0).cast("bigint"))
    out = t.groupBy("_s").agg(F.sum("_w").alias("_out"))
    te = t.join(F.broadcast(out), "_s")
    ranks = states.select("state", F.lit(scale // n).cast("bigint").alias("r"))
    for _ in range(iterations):
        ranks = (
            te.join(F.broadcast(ranks), te["_s"] == ranks["state"])
            .select(F.col("_d").alias("state"),
                    F.expr("(r * _w) div _out").alias("c"))
            .groupBy("state")
            .agg(F.sum("c").cast("bigint").alias("r"))
        )
        # keep absorbed states present at mass 0 so the relation stays
        # state-complete for the next broadcast
        ranks = states.join(F.broadcast(ranks), "state", "left").select(
            "state", F.coalesce(F.col("r"), F.lit(0)).cast("bigint").alias("r")
        ).localCheckpoint(eager=True)
    ranks = ranks.localCheckpoint(eager=True)
    t.unpersist()
    return ranks.select("state", F.col("r").alias("mass_scaled"))


def resource_allocation_link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 20,
    scale: int = 10**12,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction by the resource-allocation index (Zhou, Lü &
    Zhang 2009): RA(x,y) = Σ_{z ∈ N(x)∩N(y)} 1/deg(z) — common
    neighbors, but a shared HUB counts for little while a shared
    low-degree node is strong evidence. Consistently outperforms raw
    common-neighbor counts on real graphs.

    Determinism: the 1/deg terms are summed as SCALED INTEGERS
    (``scale div deg``, BIGINT) — order-free exact addition, so the
    score (and its tiebroken top-k) is engine-identical without any
    transcendental (1/deg is rational). The Adamic-Adar member of the
    trio lives in ``adamic_adar_link_prediction``, where the 1/ln(deg)
    terms go through the DECIMAL-routed-ln discipline instead.

    Same wedge shape and hub discipline as
    ``common_neighbor_link_prediction``: per-center fan-out d², capped
    by ``max_degree``; center degree rides the wedge join via a
    broadcast of the node-sized degree relation. Returns top-k
    (node_a, node_b, ra_scaled BIGINT, common_neighbors BIGINT)."""
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbrs = und.select(F.col("a").alias("u"), F.col("b").alias("n")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("n"))
    )
    deg = nbrs.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    if max_degree is not None:
        nbrs = nbrs.join(
            F.broadcast(deg.filter(F.col("d") > max_degree).select("u")),
            "u",
            "left_anti",
        )
    nbrs = nbrs.join(F.broadcast(deg), "u").withColumn(
        "w", F.expr(f"{scale} div d").cast("bigint")
    )
    w1 = nbrs.select("u", "w", F.col("n").alias("x"))
    w2 = nbrs.select("u", F.col("n").alias("y"))
    cand = (
        w1.join(w2, "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.sum("w").cast("bigint").alias("ra_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        )
        .join(
            und.select(F.col("a").alias("x"), F.col("b").alias("y")),
            ["x", "y"],
            "left_anti",
        )
    )
    return (
        cand.orderBy(F.desc("ra_scaled"), "x", "y")
        .limit(k)
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "ra_scaled",
            "common_neighbors",
        )
    )


def label_propagation(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    rounds: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), made deterministic: labels start as each node's own id;
    each round every node adopts the most frequent label among its
    neighbors, ties broken by the smallest label. A FIXED round count
    (synchronous LPA can oscillate on bipartite-ish structures, so
    convergence looping is deliberately not the contract) with the
    (count desc, label asc) pick makes the result a pure function of
    the edge set — replayable by the SQL oracle round for round.

    Scale: the label table is node-sized — it broadcasts onto the
    edge scan each round (the PageRank pattern; edges never shuffle);
    the (node, label) frequency agg is map-side combined; each round
    localCheckpoints to cut lineage. The symmetrized edge relation is
    persisted for the loop's lifetime (the ``pagerank``/``bfs_depths``
    contract): it feeds the initial node distinct plus every round's
    scan, and a DERIVED edge set (e.g. a co-purchase self-join) would
    otherwise re-execute per consumer. Rounds are O(1) by design (2-3
    rounds give the useful coarse communities; more rounds just bleed
    labels across weak bridges). Returns (node, community)."""
    und = edges.select(
        F.col(a_col).alias("n"), F.col(b_col).alias("m")
    ).unionByName(
        edges.select(F.col(b_col).alias("n"), F.col(a_col).alias("m"))
    ).distinct().persist()
    labels = und.select(F.col("n").alias("node")).distinct().withColumn(
        "community", F.col("node")
    )
    for _ in range(rounds):
        nbr = und.join(
            F.broadcast(labels.withColumnRenamed("node", "m")), "m"
        ).select("n", "community")
        counts = nbr.groupBy("n", "community").agg(
            F.count(F.lit(1)).alias("_c")
        )
        # winner as a MIN-STRUCT aggregation, not a row_number window
        # (r18): min(struct(-count, community)) == (count desc,
        # community asc) rn==1 — exact for integer counts — and the
        # per-node exchange partial-combines map-side instead of
        # sorting the whole (node, community) frequency relation
        labels = (
            counts.groupBy("n")
            .agg(
                F.min(
                    F.struct((-F.col("_c")).alias("_negc"), F.col("community"))
                ).alias("_b")
            )
            .select(
                F.col("n").alias("node"), F.col("_b.community").alias("community")
            )
            .localCheckpoint(eager=True)
        )
    # the final round's labels are eagerly checkpointed above, so
    # nothing recomputes through the released cache
    und.unpersist()
    return labels


def kcore(
    edges: DataFrame,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 30,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph where
    every node keeps degree >= k, found by iterative peeling (remove
    all nodes with degree < k, recompute, repeat to fixpoint) — the
    standard coarse centrality/robustness filter (spam rings and
    well-knit communities survive; tendrils and chains peel away).

    Deterministic: peeling has a unique fixpoint (the k-core is
    well-defined), so round order cannot change the answer — only the
    round COUNT at which it stabilizes, bounded by ``max_rounds``
    with a loud failure rather than a silent partial peel.

    Scale: each round is one degree aggregation (map-side combined)
    plus two semi-joins of the edge relation against the surviving
    node set; the edge table shrinks monotonically, and rounds are
    bounded by the peeling depth (tiny for real graphs — long chains
    peel log-free one layer per round, the worst case). Lineage cut
    per round. Returns (node, degree_in_core)."""
    und = edges.select(
        F.col(a_col).alias("n"), F.col(b_col).alias("m")
    ).unionByName(
        edges.select(F.col(b_col).alias("n"), F.col(a_col).alias("m"))
    ).distinct()
    cur = und.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = cur.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("n")
        n_before = cur.count()
        cur = (
            cur.join(keep, "n", "left_semi")
            .join(keep.withColumnRenamed("n", "m"), "m", "left_semi")
            .localCheckpoint(eager=True)
        )
        if cur.count() == n_before:
            return (
                cur.groupBy("n")
                .agg(F.count(F.lit(1)).cast("bigint").alias("degree_in_core"))
                .select(F.col("n").alias("node"), "degree_in_core")
            )
    raise RuntimeError(f"k-core peeling did not stabilize in {max_rounds} rounds")


def degree_assortativity(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    end-point degrees over all directed edge instances — do hubs link
    to hubs (r > 0, social nets) or to leaves (r < 0, hub-and-spoke
    infrastructure)? THE one-number mixing diagnostic that decides
    whether hub-capping (the LSH/wedge discipline used throughout this
    repo) removes a fringe or the core.

    Determinism: degrees are integers; every sufficient statistic
    (Σx, Σx², Σxy over the symmetrized pair list) is an exact BIGINT
    sum — order-free on any partitioning — and r is one fixed-order
    double expression over those integers. Regular graphs (zero
    degree variance) return NULL rather than 0/0.

    Scale: one degree aggregation + two broadcast joins of the
    node-sized degree table onto the edge list; sums map-side
    combine. Returns one row (n_nodes, n_edges, assortativity)."""
    und = edges.select(
        F.col(a_col).alias("n"), F.col(b_col).alias("m")
    ).unionByName(
        edges.select(F.col(b_col).alias("n"), F.col(a_col).alias("m"))
    ).distinct()
    deg = und.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    pairs = (
        und.join(F.broadcast(deg), "n")
        .withColumnRenamed("d", "dx")
        .join(
            F.broadcast(deg.withColumnRenamed("n", "m").withColumnRenamed("d", "dy")),
            "m",
        )
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),  # 2x undirected edges
        F.sum(F.col("dx").cast("bigint")).cast("bigint").alias("sx"),
        F.sum((F.col("dx") * F.col("dx")).cast("bigint")).cast("bigint").alias("sxx"),
        F.sum((F.col("dx") * F.col("dy")).cast("bigint")).cast("bigint").alias("sxy"),
    )
    num = s["m2"].cast("double") * s["sxy"].cast("double") - (
        s["sx"].cast("double") * s["sx"].cast("double")
    )
    den = s["m2"].cast("double") * s["sxx"].cast("double") - (
        s["sx"].cast("double") * s["sx"].cast("double")
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return (
        s.crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            (F.col("m2") / 2).cast("bigint").alias("n_edges"),
            F.when(den != 0, F.round(num / den, 6)).alias("assortativity"),
        )
    )


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
    scale: int = 2520,
) -> DataFrame:
    """Exact harmonic centrality (Marchiori & Latora 2000; Boldi &
    Vigna's preferred closeness variant because unreachable pairs
    contribute 0 instead of breaking the mean): H(v) = sum over nodes u
    reaching v of 1/d(u, v), depth-bounded by ``max_depth``. Computed
    by ALL-PAIRS frontier expansion — every node seeds its own BFS and
    the (root, node) visited relation grows by stamped rounds exactly
    like ``bfs_depths`` (the stamp IS the minimum depth; the
    exponential walk space is never materialized).

    Determinism: reciprocals of integer depths are summed as
    ``scale div depth`` EXACT INTEGERS (2520 = lcm(1..10) makes every
    1/d a whole number of 1/2520 units for depths <= 10), so the sum
    is order-free and the final harmonic value is one int/int double
    division — bit-identical on any engine or partitioning.

    Scale: the (root, node) state is node²-bounded — this exact form
    is for DIMENSION-sized graphs (the repo's nation graphs; org
    charts; schema lineage). At web scale the same statistic is
    approximated per node with HyperBall (HLL registers per frontier),
    which the sketches module's mergeable HLL state is the building
    block for; the exact form doubles as that approximation's oracle
    on small graphs. Returns (node, n_reachable, harmonic)."""
    if max_depth > 10:
        raise ValueError("scale=2520 covers depths <= 10; raise scale for deeper walks")
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    visited = (
        nodes.select(
            F.col("node").alias("root"), "node",
            F.lit(0).cast("bigint").alias("depth"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("root", "node")
    # ONE driver-synchronized job per depth (was three: an eager
    # checkpoint of the frontier, an isEmpty probe, and an eager
    # checkpoint of the union): the frontier is checkpoint-marked
    # lazily and the full count() probe materializes it — every
    # partition, so LocalRDDCheckpointData needs no second fill job —
    # while the visited relation stays a LAZY union of already-
    # materialized frontier checkpoints (nothing recomputes; the union
    # is <= max_depth scans of stored blocks, never re-derived)
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", src)), src
            )
            .select("root", F.col(dst).alias("node"))
            .distinct()
            .join(
                F.broadcast(visited.select("root", "node")),
                ["root", "node"],
                "left_anti",
            )
            .select("root", "node", F.lit(d).cast("bigint").alias("depth"))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        visited = visited.union(nxt)
        frontier = nxt.select("root", "node")
    edges.unpersist()
    reached = visited.filter(F.col("depth") >= 1)
    return (
        reached.groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reachable"),
            F.sum(F.expr(f"{scale} div depth")).cast("bigint").alias("_h"),
        )
        .select(
            "node",
            "n_reachable",
            (F.col("_h").cast("double") / F.lit(float(scale))).alias("harmonic"),
        )
    )


def hyperball_harmonic(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
    p: int = 8,
) -> DataFrame:
    """HyperBall approximate harmonic centrality (Boldi & Vigna,
    "In-Core Computation of Geometric Centralities with HyperBall",
    2013) — the WEB-SCALE path ``harmonic_centrality``'s docstring
    declares: instead of the exact all-pairs (root, node) relation
    (node²-bounded), every node carries ONE mergeable HLL register set
    summarizing its in-ball B(v, t) = {u : d(u -> v) <= t}, and

        H(v) ~= sum over t of (|B(v, t)| - |B(v, t-1)|) / t

    integrates the estimated ball growth. State is register-bounded —
    at most ``m = 2^p`` rows per node, REGARDLESS of how many nodes
    reach v — so 100 TB graphs pay n*m state where the exact form pays
    n².

    Per iteration: each edge (u, v) forwards u's registers to v (one
    shuffle of at most |E| * m̄ rows, m̄ = occupied registers, capped by
    both ball size and m), then one map-side-combined MAX per
    (node, bucket) — the HLL merge property. Convergence is detected
    from the monotone state ((row count, rho sum) strictly grows under
    any register change — both from the same cheap aggregate), so
    ``max_depth`` is a diameter bound, not a cost floor; the exact-0
    contribution of post-convergence depths means early exit is
    EXACT, not approximate.

    Determinism: registers are md5-derived integers (engine-invariant,
    ``sketches.hll_registers``); ball sizes come from the
    LinearCounting-corrected estimator rounded to 6 digits
    (``sketches.hll_estimate_corrected_from_registers`` — raw HLL
    floors at ~0.72m, so ball DIFFERENCES need the small-range
    switch); the harmonic sum is a FIXED left-to-right expression over
    the per-depth estimate columns, never a shuffle-ordered double
    sum. The exact ``harmonic_centrality`` is this operator's oracle
    on dimension-sized graphs (the ``sim_ivf_recall`` pattern).

    Returns ``(node, n_ball, harmonic_hb)``: n_ball = estimated
    |B(v, T)| including v itself; harmonic_hb ~= H(v), 0.0 for nodes
    nothing reaches."""
    wide, n_ests = _hyperball_ball_ests(edges, src, dst, max_depth, p)
    hb = F.lit(0.0)
    for t in range(1, n_ests):
        # monotonize (ADVICE r17): balls only grow, but the corrected
        # HLL estimate is not monotone in t at the LinearCounting->raw
        # crossover, so a raw difference can dip negative — clamp each
        # per-depth contribution at 0 (Boldi & Vigna's usual HyperBall
        # monotonization); the oracle applies the same greatest(,0)
        hb = hb + F.greatest(
            F.col(f"_e{t}") - F.col(f"_e{t - 1}"), F.lit(0.0)
        ) / F.lit(float(t))
    last = f"_e{n_ests - 1}"
    return wide.select(
        "node",
        F.col(last).alias("n_ball"),
        F.round(hb, 6).alias("harmonic_hb"),
    )


def _hyperball_ball_ests(
    edges: DataFrame, src: str, dst: str, max_depth: int, p: int
) -> tuple[DataFrame, int]:
    """The HyperBall register-growth loop shared by every ball-growth
    centrality: returns (wide node frame with round-6 ball-size columns
    ``_e0.._eT``, T+1) where T <= max_depth is the convergence depth.
    See ``hyperball_harmonic`` for the full contract."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    from refluxdb_spark.operators.sketches import (
        hll_estimate_corrected_from_registers,
        hll_registers,
    )

    # eager=False everywhere in this loop: the convergence probe
    # (_sig's collect) is the materializing action, so ONE job per
    # round both answers "did a register move?" and persists +
    # lineage-truncates the state (LocalRDDCheckpointData stores
    # partitions as the probe computes them) — the eager=True shape
    # paid a separate checkpoint job before every probe, doubling the
    # driver round-trips of the whole register-growth loop
    state = hll_registers(nodes, "node", p=p, by=["node"]).localCheckpoint(
        eager=False
    )

    def _sig(s: DataFrame) -> tuple:
        r = s.agg(
            F.count(F.lit(1)).alias("c"), F.sum("rho_max").alias("r")
        ).collect()[0]
        return (r["c"], r["r"])

    def _est(s: DataFrame, t: int) -> DataFrame:
        return hll_estimate_corrected_from_registers(s, p=p, by=["node"]).select(
            "node", F.lit(t).cast("int").alias("_t"), F.col("hll_estimate").alias("_est")
        )

    ests = [_est(state, 0)]
    sig = _sig(state)
    for t in range(1, max_depth + 1):
        prop = (
            edges.join(state.withColumnRenamed("node", src), src)
            .select(F.col(dst).alias("node"), "bucket", "rho_max")
        )
        new_state = (
            state.union(prop)
            .groupBy("node", "bucket")
            .agg(F.max("rho_max").alias("rho_max"))
            .localCheckpoint(eager=False)
        )
        new_sig = _sig(new_state)
        if new_sig == sig:
            break  # no register moved: every later depth contributes 0
        state, sig = new_state, new_sig
        ests.append(_est(state, t))
    edges.unpersist()
    # wide assembly as ONE conditional aggregation over the tagged
    # union of per-depth estimate frames (r18) — the previous chain of
    # T node-keyed joins planned ~4 AQE stage jobs per join (the
    # T-join assembly alone was ~40 of graph_harmonic_hyperball's 64
    # driver jobs at sf0.1). Every node appears in every depth's frame
    # (registers only grow), so max(when(_t = t)) picks exactly the
    # value the join carried — same wide row, one exchange on node.
    tagged = ests[0]
    for e in ests[1:]:
        tagged = tagged.union(e)
    wide = tagged.groupBy("node").agg(
        *[
            F.max(F.when(F.col("_t") == t, F.col("_est"))).alias(f"_e{t}")
            for t in range(len(ests))
        ]
    )
    return wide, len(ests)


def hyperball_lin_index(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
    p: int = 8,
) -> DataFrame:
    """Lin's index via HyperBall (Boldi & Vigna 2013, eq. for Lin
    1976): closeness made size-aware — nodes that reach few others
    shouldn't look central just because their average distance is
    small. With the same register balls as ``hyperball_harmonic``,

        sum_dist(v) ~= sum over t of t * (|B(v,t)| - |B(v,t-1)|)
        lin(v)       = (|B(v,T)| - 1)^2 / sum_dist(v)

    (the coreachable count squared over the distance sum; a node
    nothing reaches has Lin index 1 BY CONVENTION — Boldi & Vigna's
    choice, reproduced here as a fixed CASE on sum_dist = 0). One
    register-growth pass, register-bounded state, every output a
    fixed-order round-6 expression — same oracle discipline as the
    harmonic twin. Returns (node, n_ball, sum_dist_hb, lin_index)."""
    wide, n_ests = _hyperball_ball_ests(edges, src, dst, max_depth, p)
    sd = F.lit(0.0)
    for t in range(1, n_ests):
        # same monotonization as hyperball_harmonic (ADVICE r17)
        sd = sd + F.lit(float(t)) * F.greatest(
            F.col(f"_e{t}") - F.col(f"_e{t - 1}"), F.lit(0.0)
        )
    last = f"_e{n_ests - 1}"
    sd_r = F.round(sd, 6)
    return wide.select(
        "node",
        F.col(last).alias("n_ball"),
        sd_r.alias("sum_dist_hb"),
        F.when(sd_r == 0.0, F.lit(1.0))
        .otherwise(
            F.round(
                (F.col(last) - F.lit(1.0)) * (F.col(last) - F.lit(1.0)) / sd_r, 6
            )
        )
        .alias("lin_index"),
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    scale: int = 10**12,
    checkpoint: bool = True,
) -> DataFrame:
    """Integer-exact HITS hubs-and-authorities (Kleinberg 1999,
    "Authoritative Sources in a Hyperlinked Environment") over a
    (src, dst) edge relation — the query-dependent companion of
    ``pagerank``: authorities are nodes good hubs point AT, hubs are
    nodes that point at good authorities.

    Per iteration (the classic order: authorities from hubs, then
    hubs from the new authorities), with L1-style integer
    renormalization instead of the float L2 norm::

        a_raw(v) = sum over in-edges (u, v) of h(u)
        a(v)     = a_raw(v) * scale div sum(a_raw)      (0 if sum = 0)
        h_raw(u) = sum over out-edges (u, v) of a(v)
        h(u)     = h_raw(u) * scale div sum(h_raw)

    The renormalization product runs through DECIMAL(38,0) (a_raw is
    bounded by |E|·scale, so raw·scale can pass 2^63; decimal `div`
    truncates exactly like DuckDB's HUGEINT `//` on nonnegative
    values) — both engines walk the identical BIGINT trajectory, the
    same contract as ``pagerank``/``stationary_distribution``.

    Scale: each half-step is one edge scan with the node-sized score
    relation broadcast on, one map-side-combined aggregate keyed by
    the receiving endpoint, and a 1-row total broadcast back — no
    sort-merge machinery anywhere; lineage is cut per iteration
    (node-sized, cheap). Returns (node, auth_scaled, hub_scaled).
    """
    n_col = F.col("n")
    # every half-step scans the edge relation (2 per iteration, plus
    # the node derivation): persist it for the operator's lifetime so
    # a derived edge set (joins upstream) is built once — the same
    # reuse contract as ``pagerank``; released before return, after
    # the final scores are materialized past it.
    cache_edges = checkpoint and iterations > 0
    if cache_edges:
        edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("n"))
        .union(edges.select(F.col(dst).alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        if cache_edges:
            edges.unpersist()
        return nodes.select(
            n_col.alias("node"),
            F.lit(0).cast("bigint").alias("auth_scaled"),
            F.lit(0).cast("bigint").alias("hub_scaled"),
        )
    e = edges.select(src, dst)

    def _half_step(scores: DataFrame, recv: str, send: str) -> DataFrame:
        """One normalization half-step: push `scores` (node, x) along
        edges onto the `recv` endpoint, renormalize to total=scale."""
        raw = (
            e.join(F.broadcast(scores), e[send] == scores["n"])
            .select(F.col(recv).alias("n"), "x")
            .groupBy("n")
            .agg(F.sum("x").cast("bigint").alias("raw"))
        )
        tot = raw.agg(F.sum("raw").cast("bigint").alias("s"))
        return (
            nodes.join(F.broadcast(raw), "n", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "n",
                F.when(
                    F.col("s") > 0,
                    F.expr(
                        f"CAST((CAST(coalesce(raw, 0L) AS DECIMAL(38,0))"
                        f" * {scale}) div s AS BIGINT)"
                    ),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("x"),
            )
        )

    hubs = nodes.select("n", F.lit(scale // n_nodes).cast("bigint").alias("x"))
    auth = None
    for _ in range(iterations):
        auth = _half_step(hubs, recv=dst, send=src)
        if checkpoint:
            # checkpoint each half-step: `raw` is referenced twice
            # (the push join and its 1-row total), so an unmaterialized
            # chain doubles per half-step — the node-sized cut is
            # cheaper than the 2^depth recomputation it prevents
            auth = auth.localCheckpoint(eager=True)
        hubs = _half_step(auth, recv=src, send=dst)
        if checkpoint:
            hubs = hubs.localCheckpoint(eager=True)
    out = (
        nodes.join(
            F.broadcast(auth.select("n", F.col("x").alias("auth_scaled"))), "n"
        )
        .join(F.broadcast(hubs.select("n", F.col("x").alias("hub_scaled"))), "n")
        .select(n_col.alias("node"), "auth_scaled", "hub_scaled")
    )
    if cache_edges:
        # the final scores are already materialized (localCheckpoint
        # above), so nothing recomputes through the released cache
        out = out.localCheckpoint(eager=True)
        edges.unpersist()
    return out


def adamic_adar_link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 20,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction by the Adamic–Adar index (Adamic & Adar 2003,
    "Friends and neighbors on the Web"): AA(x,y) = Σ_{z ∈ N(x)∩N(y)}
    1/ln(deg(z)) — the log-damped middle ground between raw
    common-neighbor counts and resource allocation's 1/deg, and the
    third member of the classic CN/AA/RA trio (the
    ``resource_allocation_link_prediction`` docstring originally
    deferred AA over ln's cross-engine ulp; the DECIMAL-routed-ln
    discipline built since for tfidf/JSD/keyness closes that: each
    1/ln(d) term is ONE identical double per center, cast to
    DECIMAL(28,18) so the per-pair sums are order-free, and the
    ranking rounds to 6 with pair tiebreaks).

    Wedge shape and hub discipline identical to the RA twin
    (per-center fan-out d², ``max_degree`` cap, degree riding the
    wedge join by broadcast). Degree-1 centers generate no wedges, so
    ln(1) = 0 never reaches a division. Returns top-k
    (node_a, node_b, aa_score, common_neighbors)."""
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbrs = und.select(F.col("a").alias("u"), F.col("b").alias("n")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("n"))
    )
    deg = nbrs.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    if max_degree is not None:
        nbrs = nbrs.join(
            F.broadcast(deg.filter(F.col("d") > max_degree).select("u")),
            "u",
            "left_anti",
        )
    w = F.when(
        F.col("d") > 1, F.lit(1.0) / F.log(F.col("d").cast("double"))
    ).otherwise(F.lit(0.0))
    nbrs = nbrs.join(F.broadcast(deg), "u").withColumn(
        "w", w.cast("decimal(28,18)")
    )
    w1 = nbrs.select("u", "w", F.col("n").alias("x"))
    w2 = nbrs.select("u", F.col("n").alias("y"))
    cand = (
        w1.join(w2, "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.round(F.sum("w").cast("double"), 6).alias("aa_score"),
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        )
        .join(
            und.select(F.col("a").alias("x"), F.col("b").alias("y")),
            ["x", "y"],
            "left_anti",
        )
    )
    return (
        cand.orderBy(F.desc("aa_score"), "x", "y")
        .limit(k)
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "aa_score",
            "common_neighbors",
        )
    )
