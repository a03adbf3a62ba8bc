"""Training-data operators: dedup (+apply), similarity/ANN, text stats,
cleaning, sampling, windows, multimodal."""

from .clean import decontaminate, redact_pii, repetition_stats
from .dedup import (
    exact_dedup,
    exact_dedup_apply,
    minhash_lsh_pairs,
    minhash_signatures,
    near_dup_filter,
    ngram_jaccard_pairs,
    simhash,
)
from .sample import deterministic_sample, head_per_key, topk_by
from .similarity import (
    build_ivf_index,
    build_lsh_index,
    embedding_near_dup_pairs,
    knn_brute_force,
    knn_ivf,
    knn_ivf_probe,
    knn_lsh,
    knn_lsh_probe,
)
from .textstats import (
    bpe_token_counts,
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)
from .windows import (
    asof_join_events,
    hopping_window_agg,
    sessionize,
    tumbling_window_agg,
)

__all__ = [
    "asof_join_events",
    "bpe_token_counts",
    "build_ivf_index",
    "build_lsh_index",
    "decontaminate",
    "deterministic_sample",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "exact_dedup_apply",
    "fingerprints",
    "head_per_key",
    "hopping_window_agg",
    "knn_brute_force",
    "knn_ivf",
    "knn_ivf_probe",
    "knn_lsh",
    "knn_lsh_probe",
    "lang_id",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "near_dup_filter",
    "ngram_jaccard_pairs",
    "quality_scores",
    "redact_pii",
    "repetition_stats",
    "sessionize",
    "simhash",
    "token_counts",
    "topk_by",
    "tumbling_window_agg",
]
