"""Text analysis operators for document pipelines.

Language ID (stopword-marker heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting —
all as built-in column expressions (JVM-side, codegen; no Python in the
hot path), so a 100 TB documents table pays one scan and zero shuffles
for per-document scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from refluxdb_spark.operators.dedup import normalize_text

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small + explicit: deterministic, explainable, and easily
# re-expressed in the SQL oracle. (A production system would swap in
# fastText/CLD3 behind the same column contract.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "de": ["der", "die", "und", "das", "ist", "mit"],
    "fr": ["le", "la", "les", "et", "est", "avec"],
    "es": ["el", "los", "las", "es", "con", "una"],
    "zh": ["de5", "shi4", "zai4", "he2", "le5", "you3"],
}


def _count_markers(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Predict language by marker-token counts; highest count wins
    (ties broken by language code order), 'und' if no marker hits."""
    tokens = F.split(normalize_text(text_col), " ")
    scores = [
        _count_markers(tokens, m).alias(f"_score_{lang}") for lang, m in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    best = F.greatest(*[F.col(f"_score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # iterate reversed so earlier language codes win ties via later override
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((F.col(f"_score_{lang}") == best) & (best > 0), lang).otherwise(pred)
    return scored.withColumn(out, pred).drop(*[f"_score_{lang}" for lang in LANG_MARKERS])


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-counting columns:

    - ``ws_tokens``: whitespace-split count (the cheap estimator),
    - ``bpe_tokens``: BPE-ish subword estimate — alphanumeric runs
      contribute ceil(len/4) subwords (the ~4-chars-per-token rule),
      each punctuation char is one token,
    - ``n_chars_m``: character length.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    alnum_runs = F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != "")
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]+", ""))
    bpe = F.aggregate(
        alnum_runs,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("bigint"),
    ) + punct.cast("bigint")
    return df.select(
        "*",
        F.size(words).cast("bigint").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length(c).cast("bigint").alias("n_chars_m"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]:

    - ``mean_word_len``: avg alphanumeric-run length (garbage text runs
      long or tiny),
    - ``punct_ratio``: punctuation chars / all chars,
    - ``stopword_ratio``: English-marker tokens / all tokens,
    - ``quality``: product of three clamped sub-scores (word length in
      [3,10], punct < 20%, some stopwords) — the C4/Gopher-rule shape.

    All ratios are exact integer-count divisions in double — left
    unrounded deliberately: an integer/integer division in IEEE double
    is bit-identical in every engine, while rounding would introduce
    half-up vs half-even boundary differences.
    """
    c = F.col(text_col)
    tokens = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    n_tok = F.size(tokens)
    total_len = F.aggregate(
        tokens, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t).cast("bigint")
    )
    mean_word_len = F.when(n_tok > 0, total_len / n_tok).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]+", ""))
    punct_ratio = F.when(F.length(c) > 0, punct / F.length(c)).otherwise(F.lit(0.0))
    stop = _count_markers(tokens, LANG_MARKERS["en"])
    stopword_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))

    s_len = F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    s_punct = F.when(punct_ratio < 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    s_stop = F.when(stopword_ratio > 0, F.lit(1.0)).otherwise(F.lit(0.7))
    return df.select(
        "*",
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        (s_len * s_punct * s_stop).alias("quality"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition signals (the Gopher repetition rules):

    - ``n_words`` / ``n_distinct_words``: word counts of the normalized
      text,
    - ``dup_word_frac``: fraction of word occurrences that are repeats
      (1 - distinct/total),
    - ``top_word_frac``: the most frequent word's share of all words,
    - ``dup_bigram_frac``: fraction of 2-gram occurrences that are
      repeats — the signal that catches looped/boilerplate generation
      that word-level stats miss.

    All ratios are int/int divisions in double (bit-exact across
    engines, per the module's determinism rules). Everything is a pure
    column expression over each row: zero shuffle, scales as a map.
    The per-distinct-word count scan is O(words * distinct) per doc —
    fine for documents; for book-length inputs switch to the
    explode/groupBy shape instead.
    """
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    d = df.withColumn("_toks", toks)
    t = F.col("_toks")
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    top = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda u: F.size(F.filter(t, lambda x: x == u)),
        )
    )
    bigrams = F.when(
        n >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1), "
            "i -> concat_ws(' ', element_at(_toks, i), element_at(_toks, i + 1)))"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    d = d.withColumn("_bg", bigrams)
    nb = F.size(F.col("_bg"))
    nbd = F.size(F.array_distinct(F.col("_bg")))
    return d.select(
        *df.columns,
        n.cast("bigint").alias("n_words"),
        nd.cast("bigint").alias("n_distinct_words"),
        F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)).alias("dup_word_frac"),
        F.when(n > 0, top / n).otherwise(F.lit(0.0)).alias("top_word_frac"),
        F.when(nb > 0, (nb - nbd) / nb).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text —
    the blocking key for exact dedup and shard-stable sampling
    (``operators/dedup.exact_dedup`` groups on exactly this)."""
    return df.withColumn(out, F.md5(normalize_text(text_col)))


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf
    (tf · ln(N/df)).

    Shuffle shape: one (doc, word) aggregation for term frequencies,
    one word-level aggregation for document frequencies, a join on the
    word key (vocabulary-sized — Zipf keeps it far smaller than the
    corpus; AQE broadcasts it when it fits), and the per-doc top-k
    window. The corpus total N arrives as a broadcast 1-row cross
    join, NOT a driver-side count — nothing collects.

    Determinism: tf/df/N are integers; the only floats are one divide
    and one ln per (doc, word), in fixed order, ROUNDED to
    ``round_digits`` before ranking with a word tiebreak (ln is the
    lone not-guaranteed-correctly-rounded libm call — rounding makes
    the cross-engine boundary case vanishingly unlikely rather than
    impossible, same policy as the cosine scores).

    Returns (id, word, tf, tfidf, rank).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("word"),
    )
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    total = df.select(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.select("id", "word", "tf", "tfidf", F.row_number().over(w).cast("bigint").alias("rank"))
        .filter(F.col("rank") <= k)
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM document scoring — the CCNet/pile-style
    perplexity-proxy quality filter: score each document by the average
    log-probability of its tokens under the corpus's own unigram
    distribution (gibberish and boilerplate-free junk score low; a
    5-gram KenLM refines this, but the unigram pass is the scalable
    first cut and needs no model artifact).

    Determinism: token counts and the corpus total are exact integers;
    each token's ln(c/T) is computed once from the same two integers on
    any engine, then summed DECIMAL-routed (order-free) and rounded to
    6 digits — the same float-stability contract as tfidf_topk.

    Scale: one exchange to build the vocabulary (map-side combined),
    one token-keyed join of the exploded corpus against it (the
    vocabulary is Zipf-small next to the token stream), one final
    groupBy on the doc id. Returns (id, n_tokens, avg_logprob)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("bigint").alias("t"))
    lp = F.log(
        F.col("c").cast("double") / F.col("t").cast("double")
    ).cast("decimal(28,18)")
    return (
        toks.join(vocab, "token")
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(lp).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    window: int = 6,
) -> DataFrame:
    """Winnowing (MOSS-style) local fingerprints: hash every character
    ``k``-gram of the normalized text, slide a ``window`` over the hash
    sequence, keep each window's MINIMUM — the classic
    position-robust partial-overlap fingerprint (Schleimer et al.):
    any shared substring of length >= k + window - 1 is GUARANTEED to
    contribute at least one common fingerprint, at ~1/window the
    storage of all-grams.

    Everything is integer arithmetic over md5 (deterministic on any
    engine, same contract as the SimHash/MinHash families), built as
    array expressions beside the scan — the only post-scan cost is the
    explode of the winnowed set. Documents with fewer than
    k + window - 1 characters yield no fingerprints. Returns the
    distinct (id, fp) relation."""
    t = normalize_text(text_col)
    h32 = (
        "cast(conv(substring(md5(substring(_t, i, %d)), 1, 8), 16, 10) as bigint)"
        % k
    )
    grams = (
        f"CASE WHEN length(_t) >= {k} THEN "
        f"transform(sequence(1, length(_t) - {k - 1}), i -> {h32}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    fps = (
        f"CASE WHEN size(_grams) >= {window} THEN "
        f"array_distinct(transform(sequence(1, size(_grams) - {window - 1}), "
        f"j -> array_min(slice(_grams, j, {window})))) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    return (
        df.select(F.col(id_col).alias("id"), t.alias("_t"))
        .select("id", F.expr(grams).alias("_grams"))
        .select("id", F.explode(F.expr(fps)).alias("fp"))
    )


def winnow_shared_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    window: int = 6,
) -> DataFrame:
    """Per-document overlap evidence from winnowed fingerprints: how
    many of a document's fingerprints also appear in at least one other
    document. One exchange on the fingerprint (map-side combined),
    one per-doc aggregate — exact-dedup cost, never pairwise. Returns
    (id, n_fps, n_shared) for documents with any sharing."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window)
    sharing = fps.groupBy("fp").agg(F.count_distinct("id").alias("_docs"))
    return (
        fps.join(sharing, "fp")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fps"),
            F.sum(F.when(F.col("_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .filter(F.col("n_shared") > 0)
    )


def boilerplate_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """RefinedWeb-style line-wise (boilerplate) dedup: REMOVE every
    ``chunk_words``-word span that occurs verbatim in >= ``min_docs``
    distinct documents, and rebuild each document from its surviving
    spans in original order. Whole-doc dedup keeps boilerplate stitched
    into otherwise-unique pages; span *stats* (shared_chunk_stats)
    only report it — this operator actually strips it, which is the
    transformation a training-data pipeline applies before tokenizing.

    Plan at scale: spans are built by array slicing beside the scan and
    exploded once with their position; sharing is one groupBy on the
    span hash (map-side combined, cost proportional to token count /
    chunk_words); the rebuild is one groupBy on the doc id collecting
    (position, span) pairs — two key shuffles total, never pairwise,
    and the heavy text column rides only the explode/rebuild path, not
    the frequency aggregate. Documents whose spans are all boilerplate
    come back with empty clean_text (left join from the original ids).

    Returns (id, n_chunks, n_removed, clean_text).
    """
    words = F.split(F.col(text_col), " ")
    n_chunks_expr = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks_expr - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(spans).alias("idx", "chunk"),
    ).withColumn("h", F.md5(F.col("chunk")))
    # frequency aggregate carries only the 32-char hash, not the span
    docs_per_hash = exploded.select("id", "h").groupBy("h").agg(
        F.count_distinct("id").alias("_docs")
    )
    kept = (
        exploded.join(docs_per_hash, "h")
        .filter(F.col("_docs") < min_docs)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    totals = df.select(
        F.col(id_col).alias("id"), n_chunks_expr.cast("bigint").alias("n_chunks")
    )
    return (
        totals.join(kept, "id", "left")
        .select(
            "id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


PII_PATTERNS: dict[str, tuple[str, str]] = {
    # (regex, replacement token) — patterns restricted to syntax with
    # identical semantics in Java regex (Spark) and RE2 (DuckDB):
    # char classes, bounded repeats, \\d, \\b; no lookaround.
    "email": (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction (the scrub step a training-data
    pipeline runs before anything leaves the raw zone): per-row match
    counts for emails / phone numbers / IPv4 addresses, plus a
    ``redacted`` column with every match replaced by a typed
    placeholder. Pure per-row column expressions — zero shuffle, scales
    with the scan; counts are computed on the ORIGINAL text so
    redaction order cannot mask overlapping matches. Patterns use only
    the regex subset Java and RE2 interpret identically (documented on
    PII_PATTERNS); emails redact before phones/IPs so digit runs inside
    a replaced span are not double-counted by later passes."""
    counts = {
        f"n_{k}s": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ).cast("bigint")
        for k, (pat, _) in PII_PATTERNS.items()
    }
    redacted = F.col(text_col)
    for pat, token in PII_PATTERNS.values():
        redacted = F.regexp_replace(redacted, pat, token)
    return df.withColumns({**counts, "redacted": redacted})


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 10000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_bigram_frac: float = 0.05,
    max_top_word_frac: float = 0.15,
) -> DataFrame:
    """Gopher-style composite document filter: the keep/drop DECISION a
    training-data pipeline applies, not just the per-signal report.
    Rules evaluate in fixed order — too_short, too_long, word_len,
    repetition, top_word — and ``reason`` names the FIRST failing rule
    ('ok' when the document survives), which is what filter-funnel
    dashboards aggregate on. Built on repetition_stats' per-row
    expressions plus an exact mean-word-length (integer-sum / count
    division, bit-exact cross-engine); zero shuffle."""
    tokens = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    total_len = F.aggregate(
        tokens, F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.length(t).cast("bigint"),
    )
    mean_wl = F.when(F.size(tokens) > 0, total_len / F.size(tokens)).otherwise(
        F.lit(0.0)
    )
    scored = repetition_stats(df, text_col).withColumn("mean_word_len", mean_wl)
    reason = (
        F.when(F.col("n_words") < min_words, "too_short")
        .when(F.col("n_words") > max_words, "too_long")
        .when(
            (F.col("mean_word_len") < min_mean_word_len)
            | (F.col("mean_word_len") > max_mean_word_len),
            "word_len",
        )
        .when(F.col("dup_bigram_frac") > max_dup_bigram_frac, "repetition")
        .when(F.col("top_word_frac") > max_top_word_frac, "top_word")
        .otherwise("ok")
    )
    return scored.withColumn("reason", reason).withColumn(
        "keep", F.col("reason") == "ok"
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram-LM document scoring — the next rung above
    ``unigram_logprob`` on the CCNet/KenLM quality-filter ladder:
    p(w|u) = λ·c(uw)/c(u) + (1-λ)·c(w)/T under the corpus's own
    counts, scored as the average ln p over a document's bigram
    positions (docs whose word ORDER is unusual now score low, which
    the unigram model cannot see).

    Determinism: every probability is one fixed expression over exact
    integer counts (identical double on any engine), ln computed once
    per position, summed DECIMAL-routed, rounded to 6. Scale: unigram
    and bigram vocabularies are one map-side-combined exchange each;
    the position stream joins both (Zipf-small relations) and
    aggregates once on the doc id. Returns (id, n_bigrams,
    avg_logprob2)."""
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    d = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    uni = d.select(F.explode("_toks").alias("token")).groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cu")
    )
    total = uni.agg(F.sum("cu").cast("bigint").alias("t"))
    big = d.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1), "
                "i -> struct(element_at(_toks, i) AS prev, "
                "element_at(_toks, i + 1) AS cur))"
            )
        ).alias("_bg"),
    ).select("id", F.col("_bg.prev").alias("prev"), F.col("_bg.cur").alias("cur"))
    bvocab = big.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("cb")
    )
    cu_prev = uni.select(F.col("token").alias("_p"), F.col("cu").alias("cu_prev"))
    cu_cur = uni.select(F.col("token").alias("_c"), F.col("cu").alias("cu_cur"))
    p = (
        F.lit(lam) * (F.col("cb").cast("double") / F.col("cu_prev").cast("double"))
        + F.lit(1.0 - lam) * (F.col("cu_cur").cast("double") / F.col("t").cast("double"))
    )
    lp = F.log(p).cast("decimal(28,18)")
    return (
        big.join(bvocab, ["prev", "cur"])
        .join(cu_prev, big.prev == F.col("_p"))
        .join(cu_cur, big.cur == F.col("_c"))
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(lp).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob2"),
        )
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of each document's word distribution (nats):
    H = -Σ_w (c_w/n)·ln(c_w/n) — the information-density signal that
    separates natural prose from both keyword-stuffed spam (low H for
    its length) and random-token gibberish (H ≈ ln n). Complements the
    repetition fractions: entropy sees the WHOLE distribution, not just
    the top word.

    Determinism: the fold runs over the SORTED distinct tokens, so
    each (exact-int-ratio) term accumulates in the same order on every
    engine; the result is rounded to 6 digits because ln itself is the
    residual — Java's Math.log and C libm disagree in the final ulp
    for some inputs (measured: 30/500 docs at sf0.01), the same reason
    the other ln-based scores round. Pure per-row column expressions,
    zero shuffle; the per-distinct-count scan is O(words·distinct) per
    doc, same bound as repetition_stats."""
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    d = df.withColumn("_toks", toks)
    t = F.col("_toks")
    n = F.size(t)
    counts = F.transform(
        F.array_sort(F.array_distinct(t)),
        lambda u: F.size(F.filter(t, lambda x: x == u)),
    )
    h = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + (c / n) * F.log(c / n),
    )
    return d.select(
        *df.columns,
        n.cast("bigint").alias("n_words"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct_words"),
        F.round(F.when(n > 0, h).otherwise(F.lit(0.0)), 6).alias("entropy"),
    )


def readability_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document, from deterministic counts.

    The classic quality-filter heuristic (readability banding for
    curriculum/quality stratification) computed entirely from integer
    counts, so it is bit-exact across engines:

    - ``n_words``: non-empty whitespace tokens;
    - ``n_sentences``: 1 + count of sentence-ending punctuation runs
      (``[.!?]+``) — min 1, so unpunctuated corpora degrade to the
      one-sentence reading instead of dividing by zero;
    - ``n_syllables``: per word, the number of vowel-group runs
      (``[aeiouy]+``, lowercased), floored at 1 — the standard cheap
      syllable estimator.

    ``flesch = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)``: both ratios are
    int/int double divisions (exact operands), and the final expression
    is evaluated in one fixed order — identical in any IEEE engine.

    Scale: narrow per-row expressions only (split/transform/aggregate
    inside the row) — no shuffle, no UDF; pipelines with the scan.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1), F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0)))
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sents = F.lit(1) + F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0)))
    d = (
        df.withColumn("n_words", F.size(words))
        .withColumn("n_sentences", sents)
        .withColumn("n_syllables", syl)
        .filter(F.col("n_words") > 0)
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return d.withColumn(
        "flesch",
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
    )


def rag_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-size overlapping token-window chunking — the RAG/context
    preparation primitive: split each document into windows of
    ``chunk_tokens`` whitespace tokens with ``overlap`` tokens shared
    between neighbors (stride = chunk_tokens - overlap), re-joined to
    text. The final window is the shortened tail; a document shorter
    than one chunk yields itself as chunk 0.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text). chunk_id is
    the 0-based window index — (id, chunk_id) is the stable chunk key
    downstream embedding/dedup stages join on.

    Scale: pure per-row array arithmetic (split → sequence of starts →
    slice+join per start, exploded in place) — no shuffle, no UDF;
    chunk count per doc is ceil((n-overlap)/stride), so output size is
    input tokens × (1 + overlap/stride), a constant factor.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    # start positions 1, 1+stride, ..., with the last start rounded UP
    # to the next stride multiple so the tail tokens are always covered
    # (a stop of size-chunk+1 would drop them whenever stride doesn't
    # divide evenly); greatest() keeps single-chunk docs at one start
    starts = F.expr(
        f"sequence(1, (greatest(size(_toks) - {chunk_tokens}, 0) + {stride - 1})"
        f" div {stride} * {stride} + 1, {stride})"
    )
    chunks = base.select(
        "id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.slice(F.col("_toks"), s, chunk_tokens),
            )
        ).alias("chunk_id", "_chunk"),
    )
    return chunks.select(
        "id",
        "chunk_id",
        F.size("_chunk").alias("n_chunk_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def jsd_source_drift(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Jensen–Shannon divergence of each source's token distribution
    from the whole-corpus distribution — the drift detector that flags
    a feed whose language shifted (new boilerplate, new domain, new
    spam) before any model downstream notices.

    JSD(P‖Q) = ½ΣP·ln(P/M) + ½ΣQ·ln(Q/M), M = (P+Q)/2, computed over
    the full corpus vocabulary per source (absent tokens contribute
    only the Q side). Determinism follows ``unigram_logprob``'s
    contract: probabilities are exact integer ratios, each ln term is
    computed once from identical doubles, cast to DECIMAL(28,18) so
    the per-source sums are order-free, and the result rounds to 6.

    Scale: the global vocabulary is Zipf-small — the (source × vocab)
    grid it cross-joins into is sources×|V| rows, map-side aggregable;
    the corpus token stream is read once for both count tables.
    """
    toks = df.select(
        F.col(by).alias("src"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    sv = toks.groupBy("src", "token").agg(F.count(F.lit(1)).alias("cs"))
    ns = sv.groupBy("src").agg(F.sum("cs").cast("bigint").alias("n_s"))
    g = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = g.agg(F.sum("c").cast("bigint").alias("n"))
    grid = (
        ns.crossJoin(F.broadcast(g))
        .join(sv, ["src", "token"], "left")
        .crossJoin(F.broadcast(n))
    )
    p = F.coalesce(F.col("cs"), F.lit(0)).cast("double") / F.col("n_s").cast("double")
    q = F.col("c").cast("double") / F.col("n").cast("double")
    m = (p + q) / F.lit(2.0)
    tp = F.when(F.col("cs").isNotNull(), p * F.log(p / m)).otherwise(F.lit(0.0))
    tq = q * F.log(q / m)
    dec = "decimal(28,18)"
    return (
        grid.groupBy(F.col("src").alias(by))
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.round(
                (
                    F.sum(tp.cast(dec)).cast("double")
                    + F.sum(tq.cast(dec)).cast("double")
                )
                / 2.0,
                6,
            ).alias("jsd"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """C4-style blocklist filtering: count occurrences of blocked
    terms per document (word-grain, on the normalized token stream all
    text operators share) and emit the keep/drop decision plus the
    evidence — total hits, distinct blocked terms matched, and the
    first (lexicographically smallest) matched term for triage.

    The term list is CONFIG-sized (C4's per-language badword lists run
    a few hundred entries), so membership is a literal-array column
    expression evaluated inside whole-stage codegen: zero shuffle,
    zero joins, the corpus is scanned once. If the blocklist ever
    outgrows config scale (millions of phrases), switch to the
    explode-tokens → broadcast-join shape instead — same output
    contract, one map-side-combined aggregate keyed by doc.

    Appends (n_bad_hits, n_bad_terms, first_bad, keep) to the input
    columns; ``keep`` is true iff no blocked term occurs."""
    blocked = F.array(*[F.lit(t) for t in sorted(terms)])
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    bad = F.filter(toks, lambda t: F.array_contains(blocked, t))
    return df.select(
        *df.columns,
        F.size(bad).cast("bigint").alias("n_bad_hits"),
        F.size(F.array_distinct(bad)).cast("bigint").alias("n_bad_terms"),
        F.array_min(bad).alias("first_bad"),
        (F.size(bad) == 0).alias("keep"),
    )


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str = "doc_id",
    max_dist: int = 2,
    q: int = 3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Fuzzy string self-join via positional q-grams (Gravano et al.
    VLDB'01) with rarest-gram prefix filtering (the All-Pairs/PPJoin
    prefix idea): all pairs within Levenshtein distance ``max_dist``,
    without the quadratic cross join.

    Soundness: one edit destroys at most ``q`` of a string's
    positional q-grams and shifts survivors' positions by at most
    ``max_dist``, so after ``max_dist`` edits at most ``q*max_dist``
    grams lack a positional match in the partner — of ANY
    ``q*max_dist + 1`` grams of A, at least one matches B at
    |pos diff| <= ``max_dist`` (plus the |len_a - len_b| band). Each
    string therefore PROBES with only its ``q*max_dist + 1`` globally
    rarest grams (rarity = corpus gram frequency; deterministic
    (df, gram, pos) tiebreak) against the full positional gram index:
    recall 1 by the lemma, and corpus-frequent grams — the quadratic
    reducer on template-heavy corpora, where one common gram at one
    position pairs half the corpus — never generate probe pairs. Only
    candidates pay the exact ``levenshtein`` verify. Strings too
    short for the lemma (len < q*(max_dist+1), i.e. fewer than
    ``q*max_dist + 1`` grams) fall back to a length-banded pair join
    within the short bucket — bounded by the short-string population,
    which a key/title column keeps tiny.

    Scale: the gram relation is corpus-linear with constant fan-out;
    the probe side is ``q*max_dist + 1`` rows per string; join cost
    is sum of df(gram) over probe grams — minimized by the rarity
    choice — vs sum of df(gram)^2 for a full gram self-join
    (measured 17.7x cost at 10x docs before this change; SCALE.md
    §9). On template-heavy corpora even the 17th-rarest gram is
    corpus-frequent, so candidate VOLUME still grows superlinearly —
    which is why the exact verify runs inside the candidate join's
    own output stage (banded early-abandon ``levenshtein(a, b, d)``,
    whole-stage codegen, never shuffled) and only verified matches
    (output-linear) reach the dedup exchange: the prior
    distinct-then-join-strings-then-verify shape measured 4.7x cost
    for 3x docs on the x10→x30 segment, this shape 2.2x (sub-linear;
    x30 total 29.9s → 8.3s). ``max_gram_df`` additionally drops
    grams whose document frequency exceeds the cap from BOTH sides
    (LSH hot-bucket discipline; can lose recall on pairs whose
    matching grams are all capped — audit before enabling). Returns
    (id_a, id_b, dist)."""
    d = max_dist
    short_len = q * (d + 1)  # threshold <= 0 below this
    s = df.select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
    slong = s.filter(F.length("_s") >= short_len)
    # the string itself rides the gram relation (titles/keys are short,
    # so the linear shuffles inflate by ~len bytes/row) so the verify
    # can run INSIDE the candidate join's output stage — see below
    grams = slong.select(
        "_id",
        "_s",
        F.length("_s").alias("_len"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(_s) - {q - 1}, 1),"
                f" 1), i -> struct(i as pos, substring(_s, i, {q}) as gram))"
            )
        ).alias("_g"),
    ).select(
        "_id", "_s", "_len",
        F.col("_g.pos").alias("_pos"), F.col("_g.gram").alias("_gram"),
    )
    if max_gram_df is not None:
        hot = (
            grams.select("_id", "_gram")
            .distinct()
            .groupBy("_gram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_gram_df)
            .select("_gram")
        )
        grams = grams.join(F.broadcast(hot), "_gram", "left_anti")
    # Candidate generation: RAREST-GRAM PROBE (the All-Pairs/PPJoin
    # prefix-filter shape adapted to the positional count lemma). d
    # edits destroy at most q*d of a string's positional grams, so of
    # ANY q*d + 1 grams of A at least one survives with a positional
    # match in B (|pos diff| <= d) — probing with each string's
    # q*d + 1 GLOBALLY RAREST grams keeps recall 1 while corpus-
    # frequent grams never enter the probe side. Join cost is
    # sum(df(g)) over PROBE grams — minimized by the rarity choice —
    # instead of sum(df(g)^2) over ALL grams: the previous full
    # (gram, pos-bucket) self-join measured 17.7x cost for 10x docs
    # on word-rotated sf0.1 replicas (position-local gram density
    # grows with the corpus, so bucket-join output is quadratic on
    # template-heavy text); the probe join stays corpus-linear while
    # a string's (q*d+1)-th rarest gram stays rare, which natural
    # keys/titles satisfy. Position rides the JOIN KEY as a coarse
    # bucket (width d+1, banded range-join trick): |pos diff| <= d
    # implies bucket distance <= 1, so the probe side replicates into
    # its 3 adjacent buckets and the exact window filters residually.
    w = d + 1
    probe_n = q * d + 1
    gram_df = grams.groupBy("_gram").agg(F.count(F.lit(1)).alias("_df"))
    rank_w = Window.partitionBy("_id").orderBy("_df", "_gram", "_pos")
    probe = (
        grams.join(gram_df, "_gram")
        .withColumn("_rk", F.row_number().over(rank_w))
        .filter(F.col("_rk") <= probe_n)
        .select(
            F.col("_id").alias("_ida"), F.col("_s").alias("_sa"),
            F.col("_len").alias("_la"), F.col("_pos").alias("_pa"), "_gram",
            F.explode(
                F.array(*[F.floor(F.col("_pos") / w) + i for i in (-1, 0, 1)])
            ).alias("_bk"),
        )
    )
    index = grams.select(
        F.col("_id").alias("_idb"), F.col("_s").alias("_sb"),
        F.col("_len").alias("_lb"), F.col("_pos").alias("_pb"), "_gram",
        F.floor(F.col("_pos") / w).alias("_bk"),
    )
    # a pair is found whenever EITHER side's rare-gram probe hits the
    # other's full index, so ids are normalized after the join rather
    # than ordered inside it. The exact levenshtein verify runs RIGHT
    # HERE, inside the join's output stage, with Spark's banded
    # early-abandon form (threshold arg → O(d·len) per pair, -1 when
    # exceeded): on template-heavy corpora every string's 17th-rarest
    # gram is still corpus-frequent, so candidate volume grows
    # superlinearly (the r8 x30 sweep measured 110M joined rows for
    # 150k docs) — the one thing that must NOT happen to that volume
    # is a shuffle. Verifying pre-distinct keeps it inside one
    # whole-stage-codegen map; only true matches (output-linear, times
    # a ≤ 3·(q·d+1) duplication constant) reach the dedup exchange.
    # The previous shape — distinct the candidate pairs, then two
    # joins back to the strings, then verify — shuffled the full
    # candidate volume twice and measured 4.7x cost for 3x docs on
    # the x10→x30 segment; this one re-verifies duplicate candidates
    # (cheap, banded) instead of shuffling them (expensive).
    cand = (
        probe.join(index, ["_gram", "_bk"])
        .filter(
            (F.col("_ida") != F.col("_idb"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= d)
            & (F.abs(F.col("_pa") - F.col("_pb")) <= d)
        )
        .withColumn("_dist", F.levenshtein("_sa", "_sb", d))
        .filter(F.col("_dist") >= 0)
        .select(
            F.least("_ida", "_idb").alias("_ida"),
            F.greatest("_ida", "_idb").alias("_idb"),
            "_dist",
        )
    )
    # short strings: threshold non-positive -> length-banded pair join
    # over the near-short bucket (len < short_len + d), requiring at
    # least one SIDE to be genuinely short — symmetric, so a pair
    # straddling the boundary is caught regardless of which id is
    # smaller; |len diff| <= d keeps everything in-bucket
    near = s.filter(F.length("_s") < short_len + d)
    short_pairs = (
        near.select(F.col("_id").alias("_ida"), F.col("_s").alias("_x"))
        .crossJoin(
            near.select(F.col("_id").alias("_idb"), F.col("_s").alias("_y"))
        )
        .filter(
            (F.col("_ida") < F.col("_idb"))
            & (F.abs(F.length("_x") - F.length("_y")) <= d)
            & (
                (F.length("_x") < short_len)
                | (F.length("_y") < short_len)
            )
        )
        .withColumn("_dist", F.levenshtein("_x", "_y", d))
        .filter(F.col("_dist") >= 0)
        .select("_ida", "_idb", "_dist")
    )
    # only verified matches reach this exchange — output-linear rows
    # (a true pair appears once per probe-gram hit, a ≤ 3·(q·d+1)
    # constant), never the candidate volume
    return (
        cand.unionByName(short_pairs)
        .distinct()
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.col("_dist").cast("int").alias("dist"),
        )
    )


def pmi_cooccur(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    min_pair_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information over co-occurring word pairs — the
    collocation/word-association miner (phrase detection, embedding
    pre-analysis, topic drift): PMI(a,b) = ln(p(a,b) / (p(a) p(b)))
    with p(a,b) from pairs within ``window`` tokens and p(a) from the
    unigram distribution.

    Determinism: all counts are exact integers; each pair's PMI is one
    fixed-order expression over the same integers on any engine
    (ln((n_ab/N_pairs) / ((n_a/N)·(n_b/N))), parenthesization
    mirrored in the oracle), rounded to 6 digits. No float ever sums.

    Scale: co-occurring pairs come from ``window`` lead columns over
    ONE doc-keyed window — in-place, never a token self-join; pair and
    unigram counts are map-side-combined aggs (Zipf-small outputs);
    the tiny totals broadcast back. ``min_pair_count`` keeps the
    long tail out of the result (and kills the unstable-PMI noise
    floor). Returns (token_a, token_b, n_pair, pmi)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("_pos", "_tok"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    # all window offsets explode from ONE lead pass (a per-offset
    # union would re-run the doc-keyed window once per offset)
    with_leads = toks.select(
        "_tok",
        *[F.lead("_tok", i).over(w).alias(f"_l{i}") for i in range(1, window + 1)],
    )
    # least/greatest SKIP nulls, so a missing lead must null the whole
    # struct (not collapse to a bogus (tok, tok) pair at stream ends)
    pair = F.explode(
        F.array(
            *[
                F.when(
                    F.col(f"_l{i}").isNotNull(),
                    F.struct(
                        F.least("_tok", f"_l{i}").alias("a"),
                        F.greatest("_tok", f"_l{i}").alias("b"),
                    ),
                )
                for i in range(1, window + 1)
            ]
        )
    ).alias("_p")
    pair_counts = (
        with_leads.select(pair)
        .filter(F.col("_p").isNotNull())
        .groupBy(
            F.col("_p.a").alias("token_a"), F.col("_p.b").alias("token_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    uni = toks.groupBy("_tok").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    totals = F.broadcast(
        uni.agg(F.sum("_n").cast("bigint").alias("_nt")).crossJoin(
            pair_counts.agg(F.sum("n_pair").cast("bigint").alias("_np"))
        )
    )
    ua = uni.select(F.col("_tok").alias("token_a"), F.col("_n").alias("_na"))
    ub = uni.select(F.col("_tok").alias("token_b"), F.col("_n").alias("_nb"))
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") / F.col("_np").cast("double"))
            / (
                (F.col("_na").cast("double") / F.col("_nt").cast("double"))
                * (F.col("_nb").cast("double") / F.col("_nt").cast("double"))
            )
        ),
        6,
    ).alias("pmi")
    return (
        pair_counts.filter(F.col("n_pair") >= min_pair_count)
        .join(F.broadcast(ua), "token_a")
        .join(F.broadcast(ub), "token_b")
        .crossJoin(totals)
        .select("token_a", "token_b", "n_pair", pmi)
    )


def feature_hash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
    seed: str = "fh0",
) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al. ICML'09 /
    Vowpal Wabbit): each token maps to bucket h(token) % B with sign
    ±1 from an independent hash bit, and a document's feature vector
    is the signed count per bucket — fixed dimensionality with no
    vocabulary artifact to build, ship, or keep consistent across
    batches (THE property that matters for incremental pipelines: a
    new batch hashes identically with zero coordination). The signed
    sum keeps the estimator unbiased under collisions.

    Determinism: bucket and sign derive from md5(seed‖token) — the
    module-wide hash family, identical on any engine/partitioning.
    Long output (id, bucket, weight) — the sparse form downstream
    trainers consume; pivot to dense arrays only at the consumer.

    Scale: explode → one (id, bucket) map-side-combined aggregation;
    output ≤ min(tokens, B) rows per doc. Returns (id, bucket,
    weight)."""
    from refluxdb_spark.operators.dedup import _H32

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("_tok"),
    )
    h = F.expr(_H32.format(seed=f"{seed}:", col="_tok"))
    bucket = (h % num_buckets).cast("int")
    sign = F.when((h / F.lit(num_buckets)).cast("bigint") % 2 == 0, 1).otherwise(-1)
    return (
        toks.select("id", bucket.alias("bucket"), sign.alias("_s"))
        .groupBy("id", "bucket")
        .agg(F.sum("_s").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def dup_ngram_char_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Gopher repetition rule (Rae et al. 2021, Table A1): the fraction
    of a document's characters contained within duplicated n-grams,
    counting characters in overlapping occurrences ONCE — the rule the
    paper applies for n in 5..10 on web text (the n is parametric; the
    register default suits small synthetic corpora). "Counting once" is
    what makes this different from a plain dup-gram count: positions
    whose n-gram repeats within the document merge into maximal covered
    spans (dedup.merge_position_islands), and the covered characters
    are the span's token lengths plus its interior spaces, measured on
    the same normalized text the grams came from.

    Scale: grams leave the scan positioned (array slices, no window),
    within-doc duplication is one (id, gram-hash) aggregation with
    map-side combine, island merging sorts only duplicated positions,
    and the char accounting joins the tiny span relation back to the
    docs. Returns (id, total_chars, n_spans, dup_chars, dup_frac) for
    EVERY document (zero rows keep 0.0 — filters need the full
    population, not just offenders)."""
    from refluxdb_spark.operators.dedup import (
        duplicated_spans,
        normalize_text,
    )

    spans = duplicated_spans(df, text_col=text_col, id_col=id_col, k=n, scope="doc")
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.length(F.array_join(toks, " ")).cast("bigint").alias("total_chars"),
    )
    covered = (
        F.aggregate(
            F.slice("_toks", F.col("span_start") + 1, F.col("span_tokens")),
            F.lit(0),
            lambda acc, t: acc + F.length(t),
        )
        + F.col("span_tokens")
        - 1
    )
    j = base.join(spans, "id", "left").select(
        "id",
        "total_chars",
        F.when(F.col("span_start").isNotNull(), covered).alias("_covered"),
    )
    return j.groupBy("id", "total_chars").agg(
        F.count("_covered").cast("bigint").alias("n_spans"),
        F.coalesce(F.sum("_covered"), F.lit(0)).cast("bigint").alias("dup_chars"),
    ).select(
        "id",
        "total_chars",
        "n_spans",
        "dup_chars",
        F.when(
            F.col("total_chars") > 0,
            F.col("dup_chars").cast("double") / F.col("total_chars").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def top_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher repetition rule (Rae et al. 2021, Table A1): per document
    and per n, the single most frequent word n-gram and the fraction of
    characters its occurrences account for (count x gram chars / total
    chars — the paper's "fraction of characters contained in the most
    frequently-occurring n-gram", applied for n in 2..4). Tie-break is
    lexicographic on the gram so the winner is engine-independent.

    Scale: per-n grams are array slices beside the scan, the count is
    one (id, gram) aggregation with map-side combine, and the winner is
    a per-document window over the per-doc distinct-gram relation.
    Long output (id, n, top_gram, top_count, top_frac); documents
    shorter than n words contribute no row for that n."""
    # the incremental gram chain starts at n=2 (an n-gram extends the
    # (n-1)-gram by one token); an n below the docstring's 2..4
    # contract would otherwise surface as an opaque KeyError deep in
    # the chain (ADVICE r18)
    if not ns or min(ns) < 2:
        raise ValueError(f"ns must all be >= 2 (got {sorted(ns)})")
    from refluxdb_spark.operators.dedup import normalize_text
    from refluxdb_spark.operators.skew import spread_input

    # tokenize + the 3-way gram explode chain onto the scan; spread a
    # narrow (single-row-group) input across cores before that serial
    # fan-out (guide §2.5, see spread_input)
    df = spread_input(df, id_col)
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.length(F.array_join(toks, " ")).cast("bigint").alias("total_chars"),
    )
    # grams are built INCREMENTALLY: the n-gram at position i is the
    # (n-1)-gram at i plus one space-joined trailing token — one
    # concat per position instead of an n-element slice + array_join
    # (byte-identical strings: both are the single-space join of the
    # same n tokens; the old per-n form did 2+3+4 element-joins and 3
    # subarray allocations per position — the gram build was ~half the
    # query's steady-state CPU)
    max_n = max(ns)
    sorted_ns = sorted(ns)
    gram_cols: dict[int, str] = {}
    prev: str | None = None
    for n in range(2, max_n + 1):
        col_name = f"_g{n}"
        if prev is None:
            built = F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.concat(
                    F.get("_toks", i), F.lit(" "), F.get("_toks", i + 1)
                ),
            )
        else:
            # factory closure, NOT defaulted lambda parameters:
            # pyspark counts every parameter of the callable as a
            # lambda argument, and a second parameter means "array
            # index" to transform()
            def _mk_extend(nn: int, prev_col: str):
                def _extend(i):
                    return F.concat(
                        F.get(prev_col, i),
                        F.lit(" "),
                        F.get("_toks", i + nn - 1),
                    )

                return _extend

            built = F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                _mk_extend(n, prev),
            )
        base = base.withColumn(
            col_name,
            F.when(F.size("_toks") >= n, built).otherwise(
                F.array().cast("array<string>")
            ),
        )
        gram_cols[n] = col_name
        prev = col_name

    def _tagged(n: int) -> Column:
        return F.transform(
            gram_cols[n],
            lambda g: F.struct(
                F.lit(n).cast("int").alias("n"), g.alias("gram")
            ),
        )

    # ONE scan, ONE explode: the per-n gram streams are built as
    # n-tagged struct arrays beside each other and flattened, so the
    # corpus is scanned and tokenized once for all of ns — the old
    # union-of-branches shape re-scanned and re-normalized the corpus
    # per n (3 scans for the default (2,3,4); measured 9.0 s CPU at
    # sf0.1, the heaviest CPU in the bench). The exploded (id, n,
    # gram) multiset is row-identical to the union's, so the count
    # stays ONE map-side-combined aggregation and the winner ONE
    # (id, n) min-struct with byte-identical exchanges
    g = base.select(
        "id",
        "total_chars",
        F.explode(
            F.flatten(F.array(*[_tagged(n) for n in sorted_ns]))
        ).alias("_g"),
    ).select(
        "id",
        "total_chars",
        F.col("_g.n").alias("n"),
        F.col("_g.gram").alias("gram"),
    )
    counted = g.groupBy("id", "total_chars", "n", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("top_count")
    )
    # winner per (id, n) as a MIN-STRUCT aggregation, not a window:
    # min(struct(-count, gram)) orders count desc then gram asc —
    # exactly the row_number()==1 row the previous window picked — but
    # aggregations partial-combine map-side, so the second exchange
    # carries <= 1 row per (id, n) per map task instead of the whole
    # per-doc distinct-gram relation, and the WindowExec sort of that
    # relation disappears (guide §2.3 "aggregate before you shuffle").
    winner = counted.groupBy("id", "total_chars", "n").agg(
        F.min(
            F.struct(
                (-F.col("top_count")).cast("bigint").alias("negc"),
                F.col("gram"),
            )
        ).alias("_w")
    )
    return winner.select(
        "id",
        "n",
        F.col("_w.gram").alias("top_gram"),
        (-F.col("_w.negc")).cast("bigint").alias("top_count"),
        (
            ((-F.col("_w.negc")).cast("bigint") * F.length("_w.gram")).cast(
                "double"
            )
            / F.col("total_chars").cast("double")
        ).alias("top_frac"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval scoring (Robertson & Zaragoza 2009;
    Lucene's non-negative idf variant ln(1 + (N-df+0.5)/(df+0.5)),
    k1=1.2, b=0.75) of every document against a fixed bag of query
    terms — the ranking function RAG retrieval and search evaluation
    run on, as a corpus-scale batch scorer. Returns (id, n_matched,
    bm25) for documents matching at least one term.

    Determinism: tf, df, dl, N are exact integers; each per-term score
    is ONE fixed-shape double expression over them (IEEE ops reproduce
    bit-for-bit given identical inputs), routed through DECIMAL(28,18)
    for the order-independent per-document sum, rounded to 6 digits.

    Scale: ONE pass over the token stream — doc length and the
    per-term tfs come out of a single map-side-combined aggregation
    (one conditional sum per query term), the wide row unpivots with
    stack() (a generator: preserves the id partitioning, so the final
    per-document sum needs NO further exchange), and df/corpus stats
    broadcast. The single data-sized shuffle is the per-doc
    aggregation, ∝ documents — never vocabulary, never a second token
    scan."""
    import re as _re

    from refluxdb_spark.operators.dedup import normalize_text

    terms = list(terms)
    if not terms:
        # an empty list would render the invalid expression
        # "stack(0, )" and die in the SQL parser with an opaque error
        raise ValueError("bm25 terms must be a non-empty list")
    if len(set(terms)) != len(terms):
        # a duplicated term would emit TWO stack rows per document,
        # doubling its df_t and its summed contribution — a silently
        # wrong score, so reject instead of dedupe
        raise ValueError(f"bm25 terms must be unique, got {terms!r}")
    for t in terms:
        # terms are spliced into the stack() expression as literals
        if not _re.fullmatch(r"[a-z0-9]+", t):
            raise ValueError(f"bm25 terms must be normalized words, got {t!r}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("tok"),
    )
    per_doc = toks.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.sum("dl").cast("bigint").alias("sum_dl"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    stack_args = ", ".join(f"'{t}', _tf{i}" for i, t in enumerate(terms))
    long = per_doc.select(
        "id",
        "dl",
        F.expr(f"stack({len(terms)}, {stack_args}) AS (tok, tf)"),
    ).filter(F.col("tf") > 0)
    df_t = long.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df_t"))
    scored = long.join(F.broadcast(df_t), "tok").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df_t").cast("double") + F.lit(0.5))
        / (F.col("df_t").cast("double") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(1.2) * (
        F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * (F.col("dl").cast("double") / avgdl)
    )
    term_score = (idf * (tfd * F.lit(2.2)) / denom).cast("decimal(28,18)")
    return (
        scored.select("id", term_score.alias("_s"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.round(F.sum("_s").cast("double"), 6).alias("bm25"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    score each document under ITS OWN group's unigram LM (CCNet trains
    one LM per language) and split every group into quality tertiles by
    score — bucket 1 is the paper's "head" (lowest perplexity), the
    slice kept for pretraining. ntile over (score desc, id) makes the
    split deterministic; ln terms come from exact integer ratios and
    the per-doc mean routes through DECIMAL(28,18) (the
    unigram_logprob recipe, conditioned on the group).

    Scale: the per-group vocab is one map-side-combined aggregation;
    scoring joins tokens back on (group, token); the ntile window
    sorts only doc-level rows within each group. Returns
    (id, <by>, n_tokens, avg_logprob, ppl_bucket)."""
    from refluxdb_spark.operators.dedup import normalize_text

    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(by).alias("_grp"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    vocab = toks.groupBy("_grp", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    tot = vocab.groupBy("_grp").agg(F.sum("_c").cast("bigint").alias("_t"))
    lp = F.log(F.col("_c").cast("double") / F.col("_t").cast("double")).cast(
        "decimal(28,18)"
    )
    scored = (
        toks.join(vocab, ["_grp", "token"])
        .join(F.broadcast(tot), "_grp")
        .select("id", "_grp", lp.alias("_lp"))
    )
    per = scored.groupBy("id", "_grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("_lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_logprob"),
    )
    w = Window.partitionBy("_grp").orderBy(
        F.col("avg_logprob").desc(), F.col("id")
    )
    return per.select(
        "id",
        F.col("_grp").alias(by),
        "n_tokens",
        "avg_logprob",
        F.ntile(n_buckets).over(w).cast("int").alias("ppl_bucket"),
    )


def keyness_llr(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
    k: int = 10,
) -> DataFrame:
    """Dunning log-likelihood keyness (Dunning 1993, "Accurate Methods
    for the Statistics of Surprise and Coincidence"): for every group
    (source/feed/domain), the top-k terms most characteristic of that
    group versus the REST of the corpus by the G² log-likelihood-ratio
    statistic — the corpus-comparison primitive behind "what changed
    in this feed" triage and per-source vocabulary drift drill-down
    (the term-level companion of ``jsd_source_drift``'s one-number
    distance).

    Contingency per (group, term): a = term count in the group, b =
    count in the rest, with group/rest token totals n_s/n_r, N total.
    G² = 2·[xlx(a)+xlx(b)+xlx(n_s−a)+xlx(n_r−b)−xlx(a+b)
            −xlx(N−a−b)−xlx(n_s)−xlx(n_r)+xlx(N)]
    with xlx(x) = x·ln(x), xlx(0) = 0 — the entropy formulation, a
    single fixed-order expression over BIGINT scalars, so both engines
    evaluate identical doubles term by term (no accumulation over
    data-dependent order anywhere). ``overused`` flags direction via
    the exact integer cross-product test a·n_r > b·n_s.

    Scale: the (group × term) table is the Zipf-small vocabulary per
    group — two map-side-combined aggregations over one corpus scan,
    vocabulary-sized broadcast joins, a top-k window over the grid.
    Ranking rounds G² to 6 and tiebreaks by token (the tfidf_topk
    policy). Returns (by, token, cnt_group, cnt_rest, llr, overused,
    rank).
    """
    toks = df.select(
        F.col(by).alias("_grp"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    sv = toks.groupBy("_grp", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    ns = sv.groupBy("_grp").agg(F.sum("a").cast("bigint").alias("n_s"))
    g = sv.groupBy("token").agg(F.sum("a").cast("bigint").alias("c"))
    tot = ns.agg(F.sum("n_s").cast("bigint").alias("nn"))

    def xlx(col: Column) -> Column:
        d = col.cast("double")
        return F.when(col > 0, d * F.log(d)).otherwise(F.lit(0.0))

    b = (F.col("c") - F.col("a")).alias("b")
    grid = (
        sv.join(F.broadcast(g), "token")
        .join(F.broadcast(ns), "_grp")
        .crossJoin(F.broadcast(tot))
        .withColumn("b", b)
        .withColumn("n_r", F.col("nn") - F.col("n_s"))
    )
    g2 = F.lit(2.0) * (
        xlx(F.col("a"))
        + xlx(F.col("b"))
        + xlx(F.col("n_s") - F.col("a"))
        + xlx(F.col("n_r") - F.col("b"))
        - xlx(F.col("a") + F.col("b"))
        - xlx(F.col("nn") - F.col("a") - F.col("b"))
        - xlx(F.col("n_s"))
        - xlx(F.col("n_r"))
        + xlx(F.col("nn"))
    )
    scored = grid.withColumn("llr", F.round(g2, 6)).withColumn(
        "overused", F.col("a") * F.col("n_r") > F.col("b") * F.col("n_s")
    )
    w = Window.partitionBy("_grp").orderBy(F.col("llr").desc(), F.col("token").asc())
    return (
        scored.select(
            F.col("_grp").alias(by),
            "token",
            F.col("a").alias("cnt_group"),
            F.col("b").alias("cnt_rest"),
            "llr",
            "overused",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Zipf rank-frequency fit per group: OLS slope/intercept of
    ln(frequency) against ln(rank) over the group's full vocabulary —
    the corpus-health diagnostic (natural text runs slope ≈ −1;
    boilerplate-heavy or template-generated feeds flatten the head or
    break the tail) that complements ``vocab_growth``'s Heaps'-law
    view with the other classic power law.

    Ranks are exact integers from a (count desc, token asc)
    row_number, so x = ln(rank) and y = ln(count) are identical
    doubles in both engines. The four OLS sufficient statistics Σx,
    Σy, Σxy, Σx² accumulate over vocabulary order, so each term is
    cast to DECIMAL(28,18) first (order-free exact sums — the
    unigram_logprob contract); slope and intercept are then a fixed
    arithmetic expression over the four decimal-exact sums cast back
    to double. Returns (by, n_types, n_tokens, slope, intercept),
    slope/intercept rounded to 6.

    Scale: one corpus scan into the per-group vocabulary (Zipf-small),
    a vocabulary-sized window for ranks, one map-side-combined
    aggregate per group. Nothing is corpus-sized after the first
    aggregation.
    """
    toks = df.select(
        F.col(by).alias("_grp"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("token"),
    )
    cnt = toks.groupBy("_grp", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("_grp").orderBy(F.col("cnt").desc(), F.col("token").asc())
    ranked = cnt.withColumn("r", F.row_number().over(w).cast("bigint"))
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    dec = "decimal(28,18)"
    stats = ranked.groupBy("_grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
    )
    n = F.col("n_types").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    # denom = 0 iff every rank is identical (a single-type vocabulary):
    # no line exists — emit nulls rather than an ANSI divide-by-zero
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return stats.select(
        F.col("_grp").alias(by),
        "n_types",
        "n_tokens",
        F.when(denom != 0, F.round(slope, 6)).alias("slope"),
        F.when(
            denom != 0, F.round((F.col("sy") - slope * F.col("sx")) / n, 6)
        ).alias("intercept"),
    )


def bm25_ndcg(
    df: DataFrame,
    queries: list[tuple[str, list[str]]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """NDCG@k of the BM25 ranking against graded term-frequency
    relevance (Järvelin & Kekäläinen TOIS 2002) — the retrieval-
    quality gate for the text side, the same discipline
    ``sim_ivf_recall``/``sim_pq_recall`` apply to ANN: score the
    ranker, don't just run it. Relevance is deterministic by
    construction: rel(doc) = min(3, total tf of the query's terms) —
    graded, engine-independent, and defined on exactly the matched
    set BM25 ranks (every unmatched doc has rel 0 and appears in
    neither ranking).

    DCG@k = Σ over the top-k BM25 ranks (round-6, id tiebreak) of
    (2^rel − 1)/log2(rank+1); IDCG@k is the same sum over the ideal
    (rel desc, id) order; both are ≤k fixed-rank terms, each a single
    identical double, DECIMAL(28,18)-routed so the tiny sums are
    order-free. Returns one row per query:
    (query, n_matched, dcg, idcg, ndcg).

    Scale: ONE token-stream aggregation for ALL queries — a shared
    per-document (dl, tf per distinct term) relation that every
    query's bm25 scoring AND its graded relevance derive from
    (rel = min(3, Σ tf over the query's terms) needs no second token
    scan, and the shared aggregation exchange is deduplicated across
    query branches by ReuseExchange). The previous shape re-tokenized
    the corpus per query TWICE (a bm25_scores pass + a relevance
    pass: 6 full token scans for 3 queries — measured 2.9 s CPU at
    sf0.1, ~2.3 s of it tokenize/explode). Everything after the
    shared aggregation is doc-dimension work cut to k rows; the eval
    harness runs on a sample at 100 TB, like every recall gate here."""
    import re as _re

    from refluxdb_spark.operators.dedup import normalize_text

    if not queries:
        raise ValueError("bm25_ndcg needs at least one query")
    for _qname, terms in queries:
        terms = list(terms)
        if not terms:
            raise ValueError("bm25 terms must be a non-empty list")
        if len(set(terms)) != len(terms):
            raise ValueError(f"bm25 terms must be unique, got {terms!r}")
        for t in terms:
            if not _re.fullmatch(r"[a-z0-9]+", t):
                raise ValueError(f"bm25 terms must be normalized words, got {t!r}")

    # one tokenize + ONE map-side-combined per-doc aggregation over the
    # union of every query's terms; tf/dl/df/N integers are identical
    # to a per-query bm25_scores pass, so every downstream double is
    # bit-identical
    all_terms = sorted({t for _, ts in queries for t in ts})
    ti = {t: i for i, t in enumerate(all_terms)}
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
        ).alias("tok"),
    )
    per_doc = toks.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_tf{ti[t]}")
            for t in all_terms
        ],
    )
    stats = per_doc.agg(
        F.sum("dl").cast("bigint").alias("sum_dl"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )

    gain = (
        F.when(F.col("rel") == 1, F.lit(1.0))
        .when(F.col("rel") == 2, F.lit(3.0))
        .otherwise(F.lit(7.0))
    )
    dec = "decimal(28,18)"
    outs = []
    for qname, terms in queries:
        # the same unpivot + scoring expressions as bm25_scores, fed by
        # the SHARED per-doc tf columns; rel rides the same aggregation
        # (Σ tf over matched stacked rows = the matched-instance count
        # the old relevance pass re-tokenized the corpus for)
        stack_args = ", ".join(f"'{t}', _tf{ti[t]}" for t in terms)
        long = per_doc.select(
            "id",
            "dl",
            F.expr(f"stack({len(terms)}, {stack_args}) AS (tok, tf)"),
        ).filter(F.col("tf") > 0)
        df_t = long.groupBy("tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("df_t")
        )
        scored = long.join(F.broadcast(df_t), "tok").crossJoin(F.broadcast(stats))
        avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (
                F.col("n_docs").cast("double")
                - F.col("df_t").cast("double")
                + F.lit(0.5)
            )
            / (F.col("df_t").cast("double") + F.lit(0.5))
        )
        tfd = F.col("tf").cast("double")
        denom = tfd + F.lit(1.2) * (
            F.lit(1.0)
            - F.lit(0.75)
            + F.lit(0.75) * (F.col("dl").cast("double") / avgdl)
        )
        term_score = (idf * (tfd * F.lit(2.2)) / denom).cast(dec)
        j = (
            scored.select("id", term_score.alias("_s"), "tf")
            .groupBy("id")
            .agg(
                F.round(F.sum("_s").cast("double"), 6).alias("bm25"),
                F.least(F.lit(3), F.sum("tf")).cast("int").alias("rel"),
            )
        )
        wb = Window.orderBy(F.col("bm25").desc(), F.col("id").asc())
        wi = Window.orderBy(F.col("rel").desc(), F.col("id").asc())
        ranked = j.select(
            "id",
            "rel",
            F.row_number().over(wb).alias("rb"),
            F.row_number().over(wi).alias("ri"),
        )
        # LN2 as a shared literal (not ln(2.0) at runtime) so both
        # engines divide by the identical double
        term = lambda r: (  # noqa: E731
            gain
            / (F.log((r + F.lit(1)).cast("double")) / F.lit(0.6931471805599453))
        ).cast(dec)
        agg = ranked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum(F.when(F.col("rb") <= k, term(F.col("rb")))).cast("double").alias("dcg"),
            F.sum(F.when(F.col("ri") <= k, term(F.col("ri")))).cast("double").alias("idcg"),
        )
        outs.append(
            agg.select(
                F.lit(qname).alias("query"),
                "n_matched",
                F.round(F.col("dcg"), 6).alias("dcg"),
                F.round(F.col("idcg"), 6).alias("idcg"),
                F.when(
                    F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
                ).alias("ndcg"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
