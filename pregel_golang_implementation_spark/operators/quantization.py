"""Product quantization (PQ) — embedding compression for 100 TB-scale
vector corpora.

A 64-dim float32 embedding is 256 bytes; its PQ code at m=4 subspaces ×
256 centroids would be 4 bytes — the difference between a vector index
that fits executor memory and one that doesn't.  Jégou et al., "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011), is the public
reference; this implements the encode step (codebook training would be
per-subspace k-means — the deterministic md5-ordered sample codebook
here keeps the oracle exactly reproducible, same policy as
``similarity.ivf_centroids``).

Scale shape: the codebook (m × ksub × sub_dim floats) is tiny by
construction, collected once and inlined into the projection as
literals — cell assignment is a single shuffle-free, UDF-free codegen
pass over the corpus, identical in spirit to the SRP hyperplane and IVF
cell assignments (plan-asserted zero-Exchange pattern).

Determinism: per-subspace squared-L2 distances are rounded to 6dp
BEFORE the argmin and ties break on the smaller centroid index, so the
DuckDB oracle reproduces every code exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.similarity import ivf_centroids


def pq_codebook(
    embeddings: DataFrame,
    ksub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """ksub full-width codebook vectors: the md5(id)-smallest corpus
    vectors (deterministic pseudo-random sample, oracle-derivable);
    subspace j uses their [j*sub_dim, (j+1)*sub_dim) slices.  Returned
    in md5 order — the list INDEX is the centroid code."""
    rows = ivf_centroids(embeddings, ksub, id_col=id_col, vec_col=vec_col).collect()
    return [[float(x) for x in r["cvec"]] for r in rows]


def _sub_dist(vec_col: str, cvec: list[float], start: int, sub_dim: int):
    """6dp-rounded squared L2 between vec[start:start+sub_dim] (0-based)
    and the matching centroid slice — left-fold sum in index order, the
    same association the oracle's list_aggregate uses."""
    sub = F.slice(F.col(vec_col), start + 1, sub_dim)
    clit = F.array(*[F.lit(float(x)) for x in cvec[start : start + sub_dim]])
    sq = F.zip_with(sub, clit, lambda a, b: (a - b) * (a - b))
    return F.round(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x), 6)


def pq_codes(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, code_0 … code_{m-1}) — nearest-centroid code per
    subspace.  One codegen projection over the corpus; no shuffle, no
    UDF, no join (the codebook rides the plan as literals)."""
    assert dim % m == 0, "embedding dim must split evenly across subspaces"
    sub_dim = dim // m
    codebook = pq_codebook(embeddings, ksub, id_col=id_col, vec_col=vec_col)
    cols = [F.col(id_col).alias("vec_id")]
    for j in range(m):
        items = [
            F.struct(
                _sub_dist(vec_col, cvec, j * sub_dim, sub_dim).alias("_d"),
                F.lit(idx).cast("long").alias("_i"),
            )
            for idx, cvec in enumerate(codebook)
        ]
        cols.append(F.sort_array(F.array(*items))[0]["_i"].alias(f"code_{j}"))
    return embeddings.select(*cols)
