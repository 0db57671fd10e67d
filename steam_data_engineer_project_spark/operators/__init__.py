from .components import canonical_per_component, connected_components, connected_components_star
from .clustering import (
    incremental_semantic_verdicts,
    ivf_topk_trained,
    kmeans_int8,
    semantic_dedup_pairs,
    train_ivf_codebook,
    unit_micro_vectors,
)
from .bloom import bloom_bitset, bloom_merge, bloom_probe_count
from .dedup import (
    boilerplate_lines,
    boilerplate_merge,
    cross_corpus_contamination,
    duplicated_spans,
    exact_dedup,
    incremental_dedup_verdicts,
    incremental_duplicated_spans,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from .merge import insert_ignore, merge_monotone_max, upsert_last_wins
from .sampling import (
    deterministic_split,
    stratified_sample_exact,
    temperature_allocations,
    temperature_resample,
    token_budget_cap,
)
from .sketches import (
    kmv_distinct_estimate,
    kmv_estimate_from_sketch,
    kmv_merge,
    kmv_row_sample,
    kmv_sketch,
    sampled_group_quantiles,
)
from .chunking import chunk_documents, pack_sequences, whitespace_token_count
from .sessionize import sessionize
from .skew import salted_aggregate, salted_join
from .similarity import (
    brute_force_cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
    lsh_bucket_cosine_topk,
)
from .temporal import asof_join, asof_join_split, range_join_bucketed
from .textstats import (
    bm25_scores,
    doc_fingerprint,
    group_quantiles,
    language_id,
    text_quality,
    token_rarity_stats,
)
from .topk import latest_per_key, top_k

__all__ = [
    "asof_join",
    "asof_join_split",
    "canonical_per_component",
    "connected_components",
    "connected_components_star",
    "deterministic_split",
    "range_join_bucketed",
    "stratified_sample_exact",
    "bloom_bitset",
    "bloom_merge",
    "bloom_probe_count",
    "bm25_scores",
    "boilerplate_lines",
    "boilerplate_merge",
    "cross_corpus_contamination",
    "duplicated_spans",
    "exact_dedup",
    "group_quantiles",
    "incremental_dedup_verdicts",
    "incremental_duplicated_spans",
    "incremental_semantic_verdicts",
    "ivf_topk_trained",
    "kmeans_int8",
    "kmv_distinct_estimate",
    "kmv_estimate_from_sketch",
    "kmv_merge",
    "kmv_row_sample",
    "kmv_sketch",
    "sampled_group_quantiles",
    "semantic_dedup_pairs",
    "temperature_allocations",
    "temperature_resample",
    "token_budget_cap",
    "train_ivf_codebook",
    "unit_micro_vectors",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "insert_ignore",
    "merge_monotone_max",
    "upsert_last_wins",
    "sessionize",
    "chunk_documents",
    "pack_sequences",
    "whitespace_token_count",
    "salted_aggregate",
    "salted_join",
    "brute_force_cosine_topk",
    "embedding_near_dup_pairs",
    "ivf_cosine_topk",
    "lsh_bucket_cosine_topk",
    "doc_fingerprint",
    "language_id",
    "text_quality",
    "latest_per_key",
    "token_rarity_stats",
    "top_k",
]
