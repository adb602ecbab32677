"""Property-based tests (hypothesis) for round-4 operators where a
pure-Python replay defines the exact expected output. Example counts
are small: each example runs a Spark job."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

values = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e6, max_value=1e6,
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), values),
        min_size=1, max_size=30,
    ),
    alpha=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
)
@settings(max_examples=10, deadline=None)
def test_ema_matches_python_replay(spark, rows, alpha):
    """EMA over arbitrary series (INCLUDING timestamp collisions — the
    eid tiebreak must pin the fold order) equals the sequential
    replay bit-for-bit."""
    from refluxdb_spark.operators.timeseries import ema

    data = [(str(k), t, i, v) for i, (k, t, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, t long, eid long, v double")
    got = {
        (r.k, r.eid): r.ema
        for r in ema(df, ts_col="t", value_col="v", by=["k"], alpha=alpha, tiebreak="eid").collect()
    }
    want = {}
    state: dict[str, float] = {}
    for k, t, eid, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        e = state.get(k)
        e = v if e is None else alpha * v + (1.0 - alpha) * e
        state[k] = e
        want[(k, eid)] = e
    assert got == want


@given(
    vecs=st.lists(
        st.lists(values, min_size=1, max_size=8),
        min_size=1, max_size=6,
    ).filter(lambda vs: len({len(v) for v in vs}) == 1),
)
@settings(max_examples=10, deadline=None)
def test_quantize_int8_codes_bounded(spark, vecs):
    """Quantized codes always lie in [-127, 127] (the int8 contract),
    scales are positive, and the max-|x| element maps to ±127."""
    from refluxdb_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    for r in quantize_int8(df).collect():
        assert r.qscale > 0
        assert all(-127 <= q <= 127 for q in r.qvec)


@given(
    sizes=st.lists(st.integers(1, 50), min_size=1, max_size=40),
    budget=st.integers(5, 100),
)
@settings(max_examples=10, deadline=None)
def test_pack_bins_replay_property(spark, sizes, budget):
    """Packing equals the pure-Python replay for arbitrary sizes and
    budgets; bins are contiguous from 0."""
    from refluxdb_spark.operators.sampling import pack_bins

    data = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(data, "k long, sz long")
    got = {r.k: r.bin_id for r in pack_bins(df, "sz", budget=budget, key_col="k").collect()}

    def bucket(k):
        return int(hashlib.md5(f"pack{k}".encode()).hexdigest()[:8], 16) % 1_000_000

    order = sorted(data, key=lambda r: (bucket(r[0]), r[0]))
    cum, want = 0, {}
    for k, s in order:
        want[k] = cum // budget
        cum += s
    assert got == want
    # bins start at 0 and never decrease along the layout order (they
    # CAN skip numbers: a doc larger than the budget jumps bins)
    layout_bins = [got[k] for k, _ in order]
    assert layout_bins[0] == 0
    assert all(a <= b for a, b in zip(layout_bins, layout_bins[1:]))


@given(
    counts=st.lists(st.integers(1, 500), min_size=1, max_size=6),
)
@settings(max_examples=8, deadline=None)
def test_temperature_rates_properties(spark, counts):
    """Temperature mixing invariants for ANY source-size profile:
    thresholds are in (0, 1e6]; the smallest source keeps everything;
    rates are monotone non-increasing in source size; and every
    threshold equals the exact Python replay floor(sqrt(c_min/c)*1e6)."""
    import math

    from refluxdb_spark.operators.sampling import temperature_rates

    rows = [
        (f"s{i}", j) for i, c in enumerate(counts) for j in range(c)
    ]
    df = spark.createDataFrame(rows, "source string, x long")
    got = {
        r.source: (r.n_total, r.keep_threshold)
        for r in temperature_rates(df, "source").collect()
    }
    c_min = min(counts)
    for i, c in enumerate(counts):
        n, thr = got[f"s{i}"]
        assert n == c
        want = min(int(math.floor(math.sqrt(c_min / c) * 1_000_000)), 1_000_000)
        assert thr == want
        assert 0 < thr <= 1_000_000
    if len(counts) > 1:
        by_size = sorted(got.values())
        for (n1, t1), (n2, t2) in zip(by_size, by_size[1:]):
            assert t2 <= t1  # bigger source never keeps a larger fraction


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=1, max_size=12,
    ),
)
@settings(max_examples=8, deadline=None)
def test_shared_chunk_stats_python_replay(spark, texts):
    """shared_chunk_stats equals a pure-Python replay on arbitrary
    (messy, multi-space, short) texts: chunking by 4-word windows over
    a plain space split, sharing by >= 2 distinct docs."""
    from refluxdb_spark.operators.dedup import shared_chunk_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.id: (r.n_chunks, r.n_shared)
        for r in shared_chunk_stats(df, chunk_words=4).collect()
    }

    chunks_by_doc = {}
    for i, t in enumerate(texts):
        words = t.split(" ")
        n = -(-len(words) // 4)
        chunks_by_doc[i] = [" ".join(words[k * 4 : (k + 1) * 4]) for k in range(n)]
    docs_per_chunk = {}
    for i, chs in chunks_by_doc.items():
        for ch in set(chs):
            docs_per_chunk.setdefault(ch, set()).add(i)
    want = {}
    for i, chs in chunks_by_doc.items():
        shared = sum(1 for ch in chs if len(docs_per_chunk[ch]) >= 2)
        if shared > 0:
            want[i] = (len(chs), shared)
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab @.-019"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=8, deadline=None)
def test_pii_redaction_idempotent_and_clean(spark, texts):
    """For ANY input: redacting an already-redacted text changes
    nothing, and a redacted text contains zero residual PII matches
    (the scrub is a fixpoint)."""
    from refluxdb_spark.operators.text import pii_stats

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    once = pii_stats(df).select(
        "id", F.col("redacted").alias("text")
    )
    twice = {r.id: r for r in pii_stats(once).collect()}
    for i, _ in rows:
        r = twice[i]
        assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 0)
        assert r.redacted == r.text


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1, max_size=12,
        ).map(" ".join),
        min_size=1, max_size=6,
    ),
    chunk_words=st.sampled_from([2, 3]),
    min_docs=st.sampled_from([2, 3]),
)
@settings(max_examples=8, deadline=None)
def test_boilerplate_removal_python_replay(spark, docs, chunk_words, min_docs):
    """boilerplate_removal equals an exact Python replay for ANY corpus:
    same kept spans, same order, same counts; docs never drop."""
    import math
    from collections import Counter

    from refluxdb_spark.operators.text import boilerplate_removal

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: r
        for r in boilerplate_removal(
            df, chunk_words=chunk_words, min_docs=min_docs
        ).collect()
    }

    def chunks(t):
        w = t.split(" ")
        n = math.ceil(len(w) / chunk_words)
        return [
            " ".join(w[i * chunk_words:(i + 1) * chunk_words]) for i in range(n)
        ]

    sharing = Counter()
    for _, t in rows:
        for c in set(chunks(t)):
            sharing[c] += 1
    assert set(got) == {i for i, _ in rows}
    for i, t in rows:
        ch = chunks(t)
        kept = [c for c in ch if sharing[c] < min_docs]
        assert got[i].n_chunks == len(ch)
        assert got[i].n_removed == len(ch) - len(kept)
        assert got[i].clean_text == " ".join(kept)


@given(
    n_pts=st.integers(3, 40),
    n_out=st.integers(3, 12),
)
@settings(max_examples=8, deadline=None)
def test_lttb_selection_properties(spark, n_pts, n_out):
    """LTTB invariants for ANY series/target size: output is a subset
    of the input, has exactly min(n, n_out) points, keeps first and
    last, and preserves time order."""
    from datetime import datetime, timedelta

    from refluxdb_spark.operators.timeseries import lttb_downsample

    t0 = datetime(2024, 1, 1)
    rows = [
        ("s", t0 + timedelta(minutes=i), float((i * 37) % 11)) for i in range(n_pts)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = sorted(
        (r.ts, r.value)
        for r in lttb_downsample(
            df, ts_col="ts", value_col="value", by=["series"], n_out=n_out
        ).collect()
    )
    assert len(out) == min(n_pts, n_out)
    assert out[0] == (t0, 0.0)
    assert out[-1][0] == t0 + timedelta(minutes=n_pts - 1)
    inset = {(ts, v) for _, ts, v in rows}
    assert all(p in inset for p in out)


@given(
    n_tokens=st.integers(1, 200),
    chunk=st.integers(2, 32),
    overlap=st.integers(0, 16),
)
@settings(max_examples=15, deadline=None)
def test_rag_chunks_cover_and_overlap(spark, n_tokens, chunk, overlap):
    """Chunking invariants for any (n, chunk, overlap): every token
    appears in at least one chunk; non-tail chunks are full-size;
    consecutive chunks overlap by exactly ``overlap`` tokens (tail may
    overlap more, never less); reassembling chunk texts at the stride
    reproduces the document."""
    from refluxdb_spark.operators.text import rag_chunks

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_text"].split(" ")) for r in
        rag_chunks(df, chunk_tokens=chunk, overlap=overlap).collect()
    )
    seen = set()
    for cid, toks in rows:
        start = cid * stride
        assert toks == [f"t{i}" for i in range(start, min(start + chunk, n_tokens))]
        seen.update(range(start, start + len(toks)))
    assert seen == set(range(n_tokens))
    if len(rows) > 1:
        for (_, a), (_, b) in zip(rows, rows[1:]):
            assert len(set(a) & set(b)) >= overlap


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1, max_size=15,
    ),
)
@settings(max_examples=10, deadline=None)
def test_pagerank_matches_python_replay(spark, edges):
    """Integer PageRank equals the sequential integer replay exactly
    on arbitrary small graphs (self-loops dropped by the caller here,
    duplicate edges NOT deduped — each contributes to outdeg, matching
    the operator's contract)."""
    from refluxdb_spark.operators.graph import pagerank

    edges = [(f"n{a}", f"n{b}") for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iterations=3).collect()}

    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    scale = 10**12
    init = scale // n
    base = (15 * init) // 100
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: init for v in nodes}
    for _ in range(3):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        r = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    assert got == r


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 2)),
        min_size=1, max_size=25,
    ),
)
@settings(max_examples=10, deadline=None)
def test_state_durations_conservation(spark, rows, ):
    """Per key: total duration across states equals (last_ts -
    first_ts) — the step-function model conserves the observed span —
    and n_entries counts runs of the deduplicated state sequence."""
    from refluxdb_spark.operators.timeseries import state_durations

    data = [(f"k{k}", t, f"s{s}", i) for i, (k, t, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "key string, sec long, st string, tb long").selectExpr(
        "key", "timestamp_micros(sec * 1000000) as ts", "st", "tb"
    )
    out = state_durations(df, "st", by=["key"], ts_col="ts", tiebreak="tb").collect()
    total = {}
    entries = {}
    for r in out:
        total[r["key"]] = total.get(r["key"], 0) + r["duration_seconds"]
        entries[r["key"]] = entries.get(r["key"], 0) + r["n_entries"]
    for key in {d[0] for d in data}:
        seq = sorted((t, tb, s) for kk, t, s, tb in data if kk == key)
        assert total[key] == seq[-1][0] - seq[0][0]
        runs = 1
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            if a != b:
                runs += 1
        assert entries[key] == runs


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=8, deadline=None)
def test_edit_distance_pairs_recall_property(spark, strings, d):
    """Property (the Gravano filter soundness bound): for ANY string
    set and max_dist, edit_distance_pairs returns EXACTLY the pairs
    the brute-force cross join finds — the count filter and the
    short-string fallback must never lose a pair (recall 1), and the
    levenshtein verify kills every false candidate (precision 1)."""
    from refluxdb_spark.operators.text import edit_distance_pairs

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "s", max_dist=d, q=3).collect()
    }
    a = df.selectExpr("doc_id as id_a", "s as sa")
    b = df.selectExpr("doc_id as id_b", "s as sb")
    truth = {
        (r.id_a, r.id_b, r.d)
        for r in a.crossJoin(b)
        .filter("id_a < id_b")
        .withColumn("d", F.expr("levenshtein(sa, sb)"))
        .filter(F.col("d") <= d)
        .collect()
    }
    assert got == truth


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.integers(min_value=0, max_value=2),   # step index
            st.integers(min_value=0, max_value=50),  # hour
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=8, deadline=None)
def test_window_funnel_matches_bruteforce(spark, events, win_h):
    """Property: window_funnel's greedy frontier equals the
    brute-force 'exists a strictly increasing chain from some step-1
    event with everything inside the window' definition."""
    from refluxdb_spark.operators.timeseries import window_funnel

    H = 3_600_000_000
    names = ["s0", "s1", "s2"]
    rows = [(u, names[k], t * H) for u, k, t in events]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, t_us long"
    ).withColumn("ts", F.timestamp_micros(F.col("t_us")))
    steps = [(n, F.col("event_type") == n) for n in names]
    got = window_funnel(df, "user_id", "ts", steps, window_us=win_h * H).collect()[0]

    # brute force per user in python
    per_user: dict[int, list[tuple[int, int]]] = {}
    for u, k, t in events:
        per_user.setdefault(u, []).append((k, t * H))
    counts = [0, 0, 0]
    for u, evs in per_user.items():
        best = 0
        starts = [t for k, t in evs if k == 0]
        for t0 in starts:
            depth, tp = 1, t0
            for lvl in (1, 2):
                nxt = [
                    t for k, t in evs
                    if k == lvl and t > tp and t <= t0 + win_h * H
                ]
                if not nxt:
                    break
                tp = min(nxt)
                depth = lvl + 1
            best = max(best, depth)
        for i in range(best):
            counts[i] += 1
    assert [got.step1_s0, got.step2_s1, got.step3_s2] == counts


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=16,
    ),
    st.integers(min_value=2, max_value=3),
)
@settings(max_examples=8, deadline=None)
def test_kcore_matches_reference_peel(spark, raw_edges, k):
    """Property: kcore equals a plain-Python peel-to-fixpoint on any
    small random graph (self-loops dropped, duplicates collapse)."""
    from refluxdb_spark.operators.graph import kcore

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges if a != b})
    if not edges:
        return
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.degree_in_core for r in kcore(df, k=k).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, ns in adj.items() if len(ns) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    expect = {n: len(ns) for n, ns in adj.items() if ns}
    assert got == expect


def _py_duplicated_spans(texts, k, scope):
    """Pure-Python replay of operators.dedup.duplicated_spans: grams at
    every position of the normalized text, dup rule per scope, island
    merge of overlapping/touching windows."""
    import re

    toks = {
        i: [t for t in re.sub(r"[^a-z0-9]+", " ", txt.lower()).strip().split(" ") if t]
        for i, txt in enumerate(texts)
    }
    grams = {
        i: [" ".join(ts[p : p + k]) for p in range(len(ts) - k + 1)]
        for i, ts in toks.items()
        if len(ts) >= k
    }
    if scope == "corpus":
        owners: dict[str, set] = {}
        for i, gs in grams.items():
            for g in gs:
                owners.setdefault(g, set()).add(i)
        dup_pos = {
            i: [p for p, g in enumerate(gs) if len(owners[g]) >= 2]
            for i, gs in grams.items()
        }
    else:
        dup_pos = {}
        for i, gs in grams.items():
            from collections import Counter

            c = Counter(gs)
            dup_pos[i] = [p for p, g in enumerate(gs) if c[g] >= 2]
    out = []
    for i, ps in dup_pos.items():
        span = None
        for p in ps:
            if span is not None and p <= span[1] + 1:  # touch/overlap: covered
                span = (span[0], max(span[1], p + k - 1), span[2] + 1)
            else:
                if span is not None:
                    out.append((i, *span))
                span = (p, p + k - 1, 1)
        if span is not None:
            out.append((i, *span))
    return sorted(out)


@given(
    texts=st.lists(
        st.lists(st.sampled_from(list("abc")), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([2, 3]),
    scope=st.sampled_from(["corpus", "doc"]),
)
@settings(max_examples=8, deadline=None)
def test_duplicated_spans_matches_python_replay(spark, texts, k, scope):
    """ExactSubstr spans over adversarial tiny-alphabet corpora (dense
    collisions, heavy within- and cross-doc repetition) equal the
    brute-force Python replay exactly — start, end, and window count
    of every maximal island."""
    from refluxdb_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r.id, r.span_start, r.span_end, r.n_windows)
        for r in duplicated_spans(df, k=k, scope=scope).collect()
    )
    want = _py_duplicated_spans(texts, k, scope)
    assert got == want


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=6).map(" ".join),
        min_size=2, max_size=12,
    ),
    n_target=st.integers(0, 4),
)
@settings(max_examples=6, deadline=None)
def test_dsir_selection_invariants(spark, texts, n_target):
    """DSIR's deterministic resampling: exactly ceil(N/5) docs selected,
    and they are precisely the top of the (log_weight desc, id) order —
    for any corpus and any target split (including empty/full)."""
    import math

    from refluxdb_spark.operators.sampling import dsir_weights

    rows = [(i, i < n_target, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, is_t boolean, text string")
    got = dsir_weights(df, target=F.col("is_t")).collect()
    assert len(got) == len(texts)
    k = math.ceil(len(texts) / 5)
    order = sorted(got, key=lambda r: (-r.log_weight, r.id))
    assert [r.selected for r in order] == [True] * k + [False] * (len(order) - k)


@given(
    grays=st.lists(st.integers(32, 127), min_size=1, max_size=6),
    threshold=st.sampled_from([0.02, 0.05, 0.2]),
)
@settings(max_examples=8, deadline=None)
def test_keyframe_select_matches_python_replay(spark, grays, threshold):
    """Real P6 decode + luma-delta rule over arbitrary constant-gray
    frame streams equals the Python replay of the same IEEE arithmetic
    exactly (lumas AND kept indices)."""
    from refluxdb_spark.operators.multimodal import attach_media, keyframe_select

    stream = b"".join(
        b"P6\n2 2\n255\n" + bytes([g] * 12) for g in grays
    )
    df = spark.createDataFrame([(1, stream)], "id long, payload binary")
    media = attach_media(df, "payload", "video/x-ppm-stream")
    got = {
        r.frame_idx: r.mean_luma
        for r in keyframe_select(media, threshold=threshold, fake=False).collect()
    }
    lumas = [(0.299 * g + 0.587 * g + 0.114 * g) / 255.0 for g in grays]
    want, prev = {}, None
    for i, lum in enumerate(lumas):
        if prev is None or abs(lum - prev) > threshold:
            want[i] = lum
        prev = lum
    assert got == want


@given(
    sets=st.dictionaries(
        st.sampled_from(["A", "B", "C"]),
        st.sets(st.integers(0, 30), min_size=1, max_size=15),
        min_size=2, max_size=3,
    ),
)
@settings(max_examples=8, deadline=None)
def test_kmv_jaccard_exact_regime_property(spark, sets):
    """With k >= |union|, the KMV estimate must EQUAL the exact Jaccard
    for every pair (the sketch's graceful-degradation contract), and
    both must match the set-arithmetic replay."""
    from refluxdb_spark.operators.sketches import kmv_jaccard_pairs

    rows = [(g, v) for g, vs in sets.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.group_a, r.group_b): r
        for r in kmv_jaccard_pairs(df, "v", "g", k=64).collect()
    }
    names = sorted(sets)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            r = got[(a, b)]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            assert r.n_inter == inter
            assert r.exact_jaccard == inter / union
            assert r.union_k == union
            assert r.kmv_jaccard == r.exact_jaccard


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1, max_size=12,
    ),
)
@settings(max_examples=8, deadline=None)
def test_harmonic_centrality_matches_bfs_replay(spark, edges):
    """Harmonic centrality over arbitrary small digraphs equals a
    brute-force per-root BFS replay with the same lcm-scaled integer
    reciprocals — reachable counts and harmonic values both."""
    from collections import deque

    from refluxdb_spark.operators.graph import harmonic_centrality

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    got = {
        r.node: (r.n_reachable, r.harmonic)
        for r in harmonic_centrality(df, max_depth=6).collect()
    }
    adj: dict[str, list[str]] = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(str(a), []).append(str(b))
        nodes.update({str(a), str(b)})
    hsum: dict[str, int] = {}
    nreach: dict[str, int] = {}
    for root in nodes:
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if d >= 1:
                hsum[v] = hsum.get(v, 0) + 2520 // d
                nreach[v] = nreach.get(v, 0) + 1
    want = {v: (nreach[v], hsum[v] / 2520.0) for v in hsum}
    assert got == want
