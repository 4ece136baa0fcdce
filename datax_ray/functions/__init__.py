"""Operator library (training-data uplift + DataX transformer surface).

Import surface for pipeline authors; every operator is a composition of
Ray Data primitives (map_batches combiners, coarse-bucket groupbys,
broadcast/hash joins) documented in its own module.
"""

from datax_ray.functions.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from datax_ray.functions.graph import connected_components
from datax_ray.functions.ordered import keyed_window, scd2_history
from datax_ray.functions.packing import pack_sequences
from datax_ray.functions.relational import (
    asof_join,
    broadcast_join,
    large_join,
    partial_agg,
    semi_join,
    top_k,
)
from datax_ray.functions.similarity import knn_brute, knn_ivf
from datax_ray.functions.sketch import hll_count_distinct
from datax_ray.functions.text import (
    LangId,
    add_fingerprint,
    add_quality_signals,
    add_token_count,
)
from datax_ray.functions.transformers import apply_transformers
from datax_ray.functions.windows import (
    hopping_window_counts,
    rolling_window_counts,
    sessionize,
    tumbling_window_counts,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "connected_components",
    "keyed_window",
    "scd2_history",
    "pack_sequences",
    "broadcast_join",
    "semi_join",
    "large_join",
    "asof_join",
    "partial_agg",
    "top_k",
    "knn_brute",
    "knn_ivf",
    "hll_count_distinct",
    "LangId",
    "add_fingerprint",
    "add_quality_signals",
    "add_token_count",
    "apply_transformers",
    "sessionize",
    "rolling_window_counts",
    "tumbling_window_counts",
    "hopping_window_counts",
]
