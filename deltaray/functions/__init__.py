"""Training-data pipeline operators built on the same Ray-Data-first
patterns as the CDC engine: vectorized Arrow batch transforms, partial
(combiner) aggregation before any shuffle, broadcast small sides, and
partition-wise grouping (never per-key ``map_groups`` — see
``partition.hash_partitioned``).
"""

from deltaray.functions.cdc_queries import (
    apply_change_stream,
    lww_latest,
    sessionize,
    sliding_window_agg,
    top_k_per_key,
    tumbling_window_agg,
    upsert_into_base,
)
from deltaray.functions.dedup import (
    connected_components,
    decontaminate,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup_docs,
    minhash_lsh_pairs,
    ngram_jaccard,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from deltaray.functions.ingest_gate import ExactIngestGate, MinHashIngestGate
from deltaray.functions.joins import (asof_join, broadcast_enrich,
                                      hash_join, range_join, semi_join)
from deltaray.functions.knn import (knn_bruteforce, knn_ivf,
                                    train_centroids, train_centroids_ds)
from deltaray.functions.partition import (deterministic_shuffle, group_codes,
                                          hash_partitioned, hash_split,
                                          stratified_sample)
from deltaray.functions.stats import (approx_distinct, exact_percentiles,
                                      grouped_percentiles, heavy_hitters)
from deltaray.functions.text import (chunk_sequences, pack_sequences,
                                     repetition_score_batch, token_topk,
                                     winnow_batch)

__all__ = [
    "apply_change_stream",
    "approx_distinct",
    "asof_join",
    "broadcast_enrich",
    "chunk_sequences",
    "connected_components",
    "decontaminate",
    "deterministic_shuffle",
    "ExactIngestGate",
    "MinHashIngestGate",
    "embedding_neardup_pairs",
    "exact_dedup",
    "exact_percentiles",
    "group_codes",
    "grouped_percentiles",
    "hash_join",
    "hash_split",
    "heavy_hitters",
    "hash_partitioned",
    "knn_bruteforce",
    "knn_ivf",
    "lww_latest",
    "minhash_dedup_docs",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "pack_sequences",
    "ngram_jaccard_pairs",
    "range_join",
    "repetition_score_batch",
    "semi_join",
    "sessionize",
    "sliding_window_agg",
    "simhash_pairs",
    "stratified_sample",
    "token_topk",
    "top_k_per_key",
    "train_centroids",
    "train_centroids_ds",
    "tumbling_window_agg",
    "upsert_into_base",
    "winnow_batch",
]
