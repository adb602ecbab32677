from refluxdb_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash,
    word_jaccard_pairs,
)
from refluxdb_spark.operators.skew import heavy_hitters, salted_join
from refluxdb_spark.operators.similarity import (
    cosine_dup_pairs,
    cosine_topk,
    ivf_topk,
    with_cosine,
)
from refluxdb_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from refluxdb_spark.operators.timeseries import (
    asof_join,
    moving_agg,
    resample,
    sessionize,
    time_bucket,
    topk_per_group,
)

__all__ = [
    "asof_join",
    "cosine_dup_pairs",
    "cosine_topk",
    "exact_dedup",
    "fingerprint",
    "heavy_hitters",
    "ivf_topk",
    "lang_id",
    "minhash_dedup_pairs",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "moving_agg",
    "quality_score",
    "resample",
    "salted_join",
    "sessionize",
    "simhash",
    "time_bucket",
    "token_stats",
    "topk_per_group",
    "with_cosine",
    "word_jaccard_pairs",
]
