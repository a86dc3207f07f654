"""Hierarchical aggregates: ROLLUP / CUBE over the fact table.

The reference engine's aggregation surface is the per-vertex fold inside
``compute`` (/root/reference/Vertex.go:71-80) plus the master-side global
aggregate (/root/reference/Master.go:958-967); a link-graph user doing
reporting over the same data immediately needs the multi-level variants —
subtotals per group, per level, and a grand total in one pass.  Spark
(and every warehouse) expresses these as grouping sets; Catalyst expands
them into a single Expand + one hash aggregate, so the cost is one scan
and one shuffle regardless of how many levels are requested — the shape
that survives 100 TB, versus the naive UNION of per-level aggregates
which rescans the fact table once per level.

Determinism: money sums use the decimal(38,9) cast-then-sum pattern
(operators/events._decimal_sum) so partition order can never flip the
hash-compared totals; grouping-level markers are rendered as the literal
'ALL' instead of NULL so the oracle compare never depends on NULL-sort
conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.events import _decimal_sum


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """(return_flag, line_status, n_items, sum_qty, revenue) at every
    ROLLUP level of (l_returnflag, l_linestatus): per-pair subtotals,
    per-flag subtotals, and the grand total.  Superaggregate rows carry
    'ALL' in the rolled-up column(s).

    Scale shape: ROLLUP is one Expand (3 replicas of each input row, one
    per grouping set) feeding a single partial+final hash aggregate — one
    shuffle keyed by (flag, status, grouping_id), ~9 distinct leaf keys,
    so the reduce side is trivially small at any input scale.
    """
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
        "_rev"
    )
    return (
        lineitem.select("l_returnflag", "l_linestatus", "l_quantity", rev)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _decimal_sum("l_quantity").alias("sum_qty"),
            _decimal_sum("_rev").alias("revenue"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("return_flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("line_status"),
            "n_items",
            "sum_qty",
            "revenue",
        )
    )


def docs_cube(docs: DataFrame) -> DataFrame:
    """(source, lang, n_docs, total_chars) at every CUBE level of
    (source, lang) — all four grouping sets, 'ALL' markers for the
    collapsed dimension(s).  Same one-Expand one-aggregate plan shape as
    ``revenue_rollup``; char totals are integer-exact."""
    return (
        docs.cube("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_chars",
        )
    )
