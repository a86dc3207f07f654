"""Multi-source BFS and sampled harmonic centrality.

Closeness-family centralities need shortest-path distances from every
vertex — quadratic and hopeless at scale — so production systems sample
pivots and run a MULTI-source BFS, one frontier expansion carrying all
pivots at once (the classic MS-BFS trick: state is keyed by (vertex,
pivot), so P pivots share each edge scan instead of running P separate
traversals).  Harmonic centrality (Boldi & Vigna 2014) is the variant
that stays well-defined on disconnected graphs: H(v) = Σ_s 1/d(s, v),
unreachable pairs contributing zero.

Spark-first shape: the (vertex, pivot) distance table is a DataFrame;
each hop is one join frontier⋈edges + one min-aggregate keyed by
(vertex, pivot) — the same one-Exchange-per-superstep profile as the
BSP runner's CC, with the pivot dimension riding along in the key (so
skew from any single pivot's frontier spreads across the hash space).
Fixed ``hops`` gives a deterministic, oracle-checkable result; the
frontier-only join means hop h touches just pairs first reached at
h−1, not the whole accumulated table.

Reference tie-in: the per-hop recurrence is the reference's SSSP
relaxation (/root/reference/Vertex.go:68-88) with unit weights and a
composite vertex key; it is expressed relationally because the runner's
state schema is single-valued per vertex by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def msbfs_distances(
    und_edges: DataFrame, pivots: list[int], hops: int
) -> DataFrame:
    """(id, pivot, dist) for every vertex within ``hops`` of any pivot
    over the symmetric edge table — one row per reached (vertex, pivot)
    pair, dist = exact hop count (BFS layers, so the first arrival is
    the shortest)."""
    # pinned: the edge projection is probed once per hop — without the
    # pin each hop re-runs the upstream edge lineage (r6)
    e = und_edges.select("src", "dst").localCheckpoint(eager=False)
    pv = F.array(*[F.lit(int(p)) for p in pivots])
    dist = (
        e.sparkSession.range(1)
        .select(F.explode(pv).alias("pivot"))
        .select(F.col("pivot").alias("id"), "pivot", F.lit(0).alias("dist"))
    )
    frontier = dist
    for h in range(1, hops + 1):
        # expand only the newest layer; min-agg dedups multi-parent hits
        reached = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(F.col("dst").alias("id"), "pivot", F.lit(h).alias("dist"))
            .groupBy("id", "pivot")
            .agg(F.min("dist").alias("dist"))
        )
        frontier = reached.join(
            dist.select("id", "pivot"), ["id", "pivot"], "left_anti"
        ).localCheckpoint(eager=False)
        dist = dist.unionByName(frontier).localCheckpoint(eager=False)
    return dist


def harmonic_centrality(
    und_edges: DataFrame, pivots: list[int], hops: int
) -> DataFrame:
    """(id, harmonic) — Σ over sample pivots of 1/d(pivot, id), self and
    unreachable-within-``hops`` pairs contributing 0; rounded to 6dp so
    the float sum is hash-stable across engines.  With pivots sampled
    uniformly, harmonic/|pivots| estimates the normalized centrality."""
    d = msbfs_distances(und_edges, pivots, hops)
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / F.col("dist").cast("double")), 6
            ).alias("harmonic")
        )
    )
