"""k-truss decomposition by iterative edge peeling.

The k-truss is the maximal subgraph in which every EDGE participates in
at least k−2 triangles — the edge-level cohesion analogue of the k-core
(kcore.py), and in practice the sharper community filter: a k-core can
be held together by one promiscuous hub, a k-truss cannot, because
membership is certified by closed triangles.  Computed by repeatedly
deleting under-supported edges until a fixed point (Cohen 2008).

Spark-first shape per round, mirroring the k-core relational-peel
discipline: one 3-way self-join over the current (a < b)-oriented edge
table enumerates triangles, each triangle credits its three edges
through one union + one (a, b)-keyed count with map-side partials, and
the peel is an inner join (edges with NO triangle have no support row
and drop with it).  Each round's survivor set is pinned with a lazy
localCheckpoint — it is consumed by three join legs next round, and the
plan would otherwise triple per round.  A fixed ``rounds`` budget gives
the deterministic, oracle-checkable convention of kcore_peel_3; once a
round deletes nothing the result is the exact k-truss.

Reference tie-in: per-round support counting is the reference's fold
(Vertex.go:71-80) keyed by EDGE instead of vertex; the peel is the
vote-to-halt shrinkage (Master.go:1044-1063) applied to edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ktruss_peel(
    oriented_edges: DataFrame,
    k: int,
    rounds: int,
) -> DataFrame:
    """Edges (src, dst, support) surviving ``rounds`` peels at truss
    level ``k`` (support ≥ k−2 in the induced subgraph of the final
    round).  ``oriented_edges`` must carry each undirected edge exactly
    once with src < dst (the `_copurchase_edges` orientation)."""
    if k < 3:
        raise ValueError(f"k must be ≥ 3 for a k-truss, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1, got {rounds}")
    e = oriented_edges.select("src", "dst")
    out = None
    for _ in range(rounds):
        e = e.localCheckpoint(eager=False)
        e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        tri = e1.join(e2, "b").join(e3, ["a", "c"])
        sup = (
            tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(
                tri.select(F.col("b").alias("src"), F.col("c").alias("dst"))
            )
            .unionByName(
                tri.select(F.col("a").alias("src"), F.col("c").alias("dst"))
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        out = sup.filter(F.col("support") >= k - 2)
        e = out.select("src", "dst")
    return out
