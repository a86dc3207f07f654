"""Deterministic random walks over the directed graph.

Graph-walk sampling is the standard way a training pipeline turns a link
graph into sequence data (DeepWalk / node2vec corpora).  True RNG breaks
cross-engine reproducibility, so the "random" transition is the repo's
md5 trick: from node v at step t, follow the out-neighbor whose rank is

    hash48(concat(v, '#', t)) mod outdeg(v)

where hash48 = first 12 hex chars of md5 as an integer (exact in a
BIGINT) and neighbor ranks are ``row_number() OVER (PARTITION BY src
ORDER BY dst) - 1`` — a fixed pseudo-random permutation both engines
derive identically (same device as operators/mis.py priorities).

Scale notes (100 TB stance):
  - neighbor ranks come from a per-src window — partitioned by src,
    fully parallel, no single reducer;
  - each step is one equi-join of the walk frontier against the ranked
    edge list on (node = src, rank) — key-partitioned, co-partitionable
    across steps because the join key is always the edge src;
  - walks at dead-end nodes (no out-edges) simply stop: the step join
    drops them, and shorter walks surface honestly in the output.

Reference parity: the reference's compute loop re-scatters along edges
each superstep (Vertex.go:54-66, Worker.go:799-849); a walk step is the
same scatter restricted to one deterministic out-edge per walker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash48(col) -> F.Column:
    """First 12 hex chars of md5 as an exact BIGINT (< 2^48)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")


def random_walks(edges: DataFrame, length: int = 3) -> DataFrame:
    """(start BIGINT, step BIGINT, node BIGINT) — one deterministic walk
    of up to ``length`` steps from every vertex with at least one
    out-edge.  step 0 is the start itself; a walk that reaches a
    dead-end node emits no further rows."""
    edges = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    w = Window.partitionBy("src").orderBy("dst")
    ranked = edges.select(
        "src",
        "dst",
        (F.row_number().over(w) - 1).cast("long").alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).cast("long").alias("deg"),
    )
    # plan-depth guard: each step joins against this one frame; pin it so
    # the L-step loop reuses a single ranked edge list instead of
    # re-deriving the window L times (the repo's plan-doubling guard)
    ranked = ranked.localCheckpoint(eager=False)

    starts = edges.select("src").distinct()
    cur = starts.select(
        F.col("src").alias("start"), F.col("src").alias("node")
    )
    out = cur.select("start", F.lit(0).cast("long").alias("step"), "node")
    for t in range(1, length + 1):
        pick = _hash48(F.concat(F.col("node").cast("string"), F.lit("#"), F.lit(t)))
        nxt = (
            cur.join(ranked, cur["node"] == ranked["src"])
            .where(F.col("rank") == pick % F.col("deg"))
            .select("start", F.col("dst").alias("node"))
        )
        out = out.unionByName(
            nxt.select("start", F.lit(t).cast("long").alias("step"), "node")
        )
        cur = nxt
    return out
