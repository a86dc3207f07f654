from pregel_golang_implementation_spark.operators.pagerank import pagerank, pagerank_spec
from pregel_golang_implementation_spark.operators.connected_components import (
    connected_components,
    cc_spec,
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
    exact_duplicates,
    minhash_dedup,
    ngram_jaccard,
    simhash,
)
from pregel_golang_implementation_spark.operators.similarity import (
    ann_topk,
    cosine_topk,
    srp_buckets,
)
from pregel_golang_implementation_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)

__all__ = [
    "exact_duplicates",
    "minhash_dedup",
    "ngram_jaccard",
    "simhash",
    "ann_topk",
    "cosine_topk",
    "srp_buckets",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
    "pagerank",
    "pagerank_spec",
    "connected_components",
    "cc_spec",
    "sssp",
    "sssp_spec",
    "label_propagation",
    "lpa_spec",
    "triangle_count",
    "triangles_per_vertex",
]
