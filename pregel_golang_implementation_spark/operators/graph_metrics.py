"""Whole-graph summary metrics.

The reference computes no graph-level statistics beyond per-vertex state
(its only global is the aggregator at Master.go:958-967); these are the
descriptive metrics a link-graph pipeline reports next to PageRank runs.

Cross-engine float determinism: every aggregate is accumulated as an
exact BIGINT sufficient statistic first (counts, degree sums, degree
products — all integers), and the floating-point formula is applied to
those exact integers at the very end.  IEEE +,-,*,/ and sqrt are
correctly rounded, so Spark and the DuckDB oracle produce bit-identical
doubles — no accumulation-order sensitivity anywhere (the same trick as
operators/events.py's decimal(38,9) sums).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """1-row (assortativity): Pearson correlation, over directed edges,
    of source out-degree vs destination in-degree — do hubs link to
    hubs?  (Newman 2002's degree assortativity, out-in flavor.)

    Scale shape: two degree aggregates (map-side combinable), two
    shuffle joins keyed src / dst (the same keys every Pregel superstep
    already shuffles on — co-partitioned with the edge layout), then a
    single 1-row aggregate of six integer sums.  Degree products fit
    BIGINT while Σ(x·y) < 2^63 — at 10^12 edges with hub degrees ~10^6
    the sums need the decimal(38,0) widening noted inline.
    """
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    xy = (
        edges.join(outdeg, "src")
        .join(indeg, "dst")
        .select(F.col("x").cast("long"), F.col("y").cast("long"))
    )
    # exact integer sufficient statistics (swap .cast("decimal(38,0)")
    # in at the 10^12-edge scale where Σxy can overflow int64)
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
        (n * syy - sy * sy).cast("double")
    )
    return s.select(F.round(num / den, 6).alias("assortativity"))


def square_count(
    und_edges: DataFrame, max_middle_degree: int | None = 100
) -> DataFrame:
    """One row (n_squares, excluded_middles) — the number of 4-cycles
    (squares): Σ over vertex pairs sharing c ≥ 2 neighbors of C(c, 2),
    divided by 2 because each square is counted once from each of its
    two diagonal pairs.  On a bipartite graph (where triangles cannot
    exist) squares ARE the clustering motif — two orders sharing two
    parts, the co-purchase overlap signal.

    Same wedge discipline as link_prediction/projection: work is
    Σ_m deg(m)², middles above ``max_middle_degree`` are cut up front
    and REPORTED in the result row (never silent — the count is then a
    documented lower bound over the capped graph).  One self-join keyed
    by the middle + one (a, b) aggregate + one scalar sum.
    """
    # e feeds the degree aggregate + wedge build (and the count action);
    # e_mid self-joins — pin both (no exchange reuse in this build, r6)
    e = und_edges.select("src", "dst").localCheckpoint(eager=False)
    excluded = 0
    if max_middle_degree is not None:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        excluded = deg.filter(F.col("_d") > max_middle_degree).count()
        if excluded:
            log.warning(
                "square_count: %d middle vertices above degree cap %d "
                "excluded — the count is a lower bound",
                excluded,
                max_middle_degree,
            )
        e_mid = e.join(
            deg.filter(F.col("_d") <= max_middle_degree).select("src"), "src"
        ).localCheckpoint(eager=False)
    else:
        e_mid = e  # already pinned above
    pairs = (
        e_mid.alias("l")
        .join(e_mid.alias("r"), F.col("l.src") == F.col("r.src"))
        .filter(F.col("l.dst") < F.col("r.dst"))
        .select(F.col("l.dst").alias("a"), F.col("r.dst").alias("b"))
    )
    common = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    return common.agg(
        (F.sum(F.col("c") * (F.col("c") - 1) / 2) / 2)
        .cast("long")
        .alias("n_squares"),
        F.lit(excluded).cast("long").alias("excluded_middles"),
    )


def powerlaw_alpha(
    und_edges: DataFrame, d_min: int = 2
) -> DataFrame:
    """One row (n_tail, d_min, alpha) — the maximum-likelihood power-law
    exponent of the degree distribution over vertices with degree ≥
    ``d_min``: α = 1 + n / Σ ln(d_i / (d_min − ½)) (Clauset, Shalizi &
    Newman 2009, discrete approximation).  THE one-number answer to "is
    this graph web-shaped?" — web/link graphs sit near α ≈ 2.1-2.7;
    uniform-degree graphs blow α upward.

    Cross-engine determinism: degrees are exact integers into ln; the
    Σ ln(·) accumulates in double (order-dependent at the last ulp) and
    the final α is rounded to 6dp — the repo's ln/round discipline.
    Scale shape: one degree aggregate + one 1-row aggregate.
    """
    if d_min < 1:
        raise ValueError(f"d_min must be ≥ 1, got {d_min}")
    deg = und_edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    tail = deg.filter(F.col("d") >= d_min)
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.sum(
                F.log(F.col("d").cast("double") / F.lit(d_min - 0.5))
            ),
            6,
        ).alias("alpha"),
    )


def partition_quality(
    und_edges: DataFrame,
    assignments: DataFrame,
    num_parts: int,
) -> DataFrame:
    """(strategy, cut_frac, balance) — evaluate vertex→partition
    placements by the two numbers that decide shuffle cost at cluster
    scale: the EDGE-CUT fraction (edges whose endpoints land in
    different partitions — each one is a network message every
    superstep) and the BALANCE (largest partition ÷ ideal size — the
    straggler bound).  The reference hardcodes contiguous range
    partitioning (/root/reference/InputParsing.go:57-68) and never
    measures either; this makes placement choices comparable before a
    10^12-edge job is launched.

    ``assignments``: (id, strategy, part) — any number of candidate
    strategies evaluated in one pass each.  Ratios are exact integer
    counts into one IEEE division, 6dp round (cross-engine stable).

    Scale shape per strategy: two co-partitioned joins keyed by the
    vertex id (the layout every superstep already uses) + two tiny-key
    aggregates; nothing vertex-quadratic.
    """
    e = und_edges.select("src", "dst")
    a = assignments.select(
        "strategy", F.col("id").cast("long").alias("id"), F.col("part")
    )
    cut = (
        e.join(a.select("strategy", F.col("id").alias("src"),
                        F.col("part").alias("_ps")), "src")
        .join(
            a.select("strategy", F.col("id").alias("dst"),
                     F.col("part").alias("_pd")),
            ["strategy", "dst"],
        )
        .groupBy("strategy")
        .agg(
            F.count(F.lit(1)).alias("_n_edges"),
            F.sum((F.col("_ps") != F.col("_pd")).cast("long")).alias("_n_cut"),
        )
    )
    sizes = a.groupBy("strategy", "part").agg(F.count(F.lit(1)).alias("_sz"))
    bal = sizes.groupBy("strategy").agg(
        F.max("_sz").alias("_max_sz"), F.sum("_sz").alias("_n_v")
    )
    return cut.join(bal, "strategy").select(
        "strategy",
        F.round(
            F.col("_n_cut").cast("double") / F.col("_n_edges").cast("double"), 6
        ).alias("cut_frac"),
        F.round(
            F.col("_max_sz").cast("double")
            / (F.col("_n_v").cast("double") / F.lit(float(num_parts))),
            6,
        ).alias("balance"),
    )
