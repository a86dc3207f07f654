"""Hub-salting helpers (SURVEY.md §4 P7 — skew the reference cannot
handle: a hub vertex's whole inbox lands on one worker, Worker.go:821)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pregel_golang_implementation_spark.sources.graphs import (
    salt_hubs,
    synthetic_edges,
    unsalt_ids,
)


def test_salt_roundtrip_and_split(spark):
    # a 1000-in-degree hub plus background edges
    hub = spark.createDataFrame(
        [(i, 99_999, 1.0) for i in range(1000)], "src long, dst long, weight double"
    )
    bg = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    edges = hub.union(bg)
    salted, hubs = salt_hubs(edges, degree_threshold=100, num_salts=8)
    assert {r["dst"] for r in hubs.collect()} == {99_999}
    # non-hub edges untouched
    plain = salted.filter(F.col("dst") >= 0)
    assert {(r["src"], r["dst"]) for r in plain.collect()} == {(1, 2), (2, 3)}
    # hub inbox split across multiple salted keys
    salted_keys = salted.filter(F.col("dst") < 0).select("dst").distinct().count()
    assert 2 <= salted_keys <= 8
    # per-salt partial min then global min == unsalted min (combiner algebra)
    partial = (
        salted.filter(F.col("dst") < 0)
        .groupBy("dst")
        .agg(F.min("src").alias("m"), F.count(F.lit(1)).alias("n"))
    )
    merged = (
        unsalt_ids(partial, id_col="dst", num_salts=8)
        .groupBy("dst")
        .agg(F.min("m").alias("m"), F.sum("n").alias("n"))
        .collect()
    )
    assert len(merged) == 1
    assert merged[0]["dst"] == 99_999 and merged[0]["m"] == 0 and merged[0]["n"] == 1000
