from pregel_golang_implementation_spark.sources.graphs import (
    edges_from_lineitem,
    edges_from_orders,
    load_reference_graph,
    synthetic_edges,
)
from pregel_golang_implementation_spark.sources.corpus import (
    extract_import_edges,
    synthetic_corpus,
    verify_content_sha256,
)

__all__ = [
    "edges_from_lineitem",
    "edges_from_orders",
    "load_reference_graph",
    "synthetic_edges",
    "extract_import_edges",
    "synthetic_corpus",
    "verify_content_sha256",
]
