from pregel_golang_implementation_spark.operators.pagerank import (
    pagerank,
    pagerank_spec,
    personalized_pagerank,
    personalized_pagerank_spec,
)
from pregel_golang_implementation_spark.operators.connected_components import (
    connected_components,
    cc_spec,
    incremental_connected_components,
)
from pregel_golang_implementation_spark.operators.sssp import sssp, sssp_spec
from pregel_golang_implementation_spark.operators.label_propagation import (
    label_propagation,
    lpa_spec,
)
from pregel_golang_implementation_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
)
from pregel_golang_implementation_spark.operators.dedup import (
    dedup_corpus,
    exact_duplicates,
    exact_representatives,
    minhash_dedup,
    near_dup_clusters,
    ngram_jaccard,
    oversized_buckets,
    simhash,
)
from pregel_golang_implementation_spark.operators.similarity import (
    ann_candidates,
    ann_topk,
    cosine_topk,
    embedding_near_dups,
    oversized_srp_buckets,
    srp_buckets,
)
from pregel_golang_implementation_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)

__all__ = [
    "dedup_corpus",
    "exact_duplicates",
    "exact_representatives",
    "minhash_dedup",
    "near_dup_clusters",
    "ngram_jaccard",
    "oversized_buckets",
    "simhash",
    "ann_candidates",
    "ann_topk",
    "cosine_topk",
    "embedding_near_dups",
    "oversized_srp_buckets",
    "srp_buckets",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
    "pagerank",
    "pagerank_spec",
    "personalized_pagerank",
    "personalized_pagerank_spec",
    "connected_components",
    "cc_spec",
    "incremental_connected_components",
    "sssp",
    "sssp_spec",
    "label_propagation",
    "lpa_spec",
    "triangle_count",
    "triangles_per_vertex",
]
