"""Bucketed storage: co-located joins must plan zero Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.sources.bucketed import (
    assert_bucket_local_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def tables(spark):
    edges = spark.range(2000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7) % 500).alias("dst"),
    )
    state = spark.range(500).select(
        F.col("id").alias("src"), (F.col("id") * 2.0).alias("value")
    )
    write_bucketed(edges, "t_edges_b", "src", buckets=8)
    write_bucketed(state, "t_state_b", "src", buckets=8)
    yield "t_edges_b", "t_state_b"
    spark.sql("DROP TABLE IF EXISTS t_edges_b")
    spark.sql("DROP TABLE IF EXISTS t_state_b")


def test_bucketed_join_has_no_exchange(spark, tables):
    et, st = tables
    plan = assert_bucket_local_join(spark, et, st, "src")
    assert "Exchange" not in plan


def test_bucketed_join_result_correct(spark, tables):
    et, st = tables
    j = read_bucketed(spark, et).join(read_bucketed(spark, st), "src")
    assert j.count() == 2000
    one = j.filter(F.col("src") == 3).first()
    assert one["value"] == 6.0


def test_mismatched_buckets_detected(spark, tables):
    et, _ = tables
    other = spark.range(500).select(
        F.col("id").alias("src"), F.lit(1.0).alias("w")
    )
    write_bucketed(other, "t_state_m", "src", buckets=16)  # wrong count
    try:
        with pytest.raises(AssertionError, match="Exchange"):
            assert_bucket_local_join(spark, et, "t_state_m", "src")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_state_m")
