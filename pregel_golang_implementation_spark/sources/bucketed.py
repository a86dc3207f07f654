"""Bucketed edge/state storage — co-located joins with ZERO Exchange.

Every Pregel superstep joins the edge table on src (scatter) and the
state table on id (apply); PregelRunner pays one repartition per run to
co-locate them.  For a PERSISTENT 100 TB graph the right move is to pay
that shuffle once at write time: store both tables bucketed (and
sorted) by their join key with the same bucket count, and every
subsequent run's scatter/apply joins plan as bucket-local sort-merge
joins with NO Exchange and NO Sort on either side — the cluster-scale
equivalent of the reference's static hash partitioning
(/root/reference/InputParsing.go:57-68), but durable across jobs and
crash-safe because it is just a table layout, not process state.

The layout contract (bucket count, key, sort) lives in the catalog, so
Catalyst proves co-location statically; `assert_bucket_local_join`
turns that proof into a regression check the test suite runs (the same
plan-audit discipline as tools/explain_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
) -> None:
    """Persist ``df`` bucketed AND sorted by ``key`` into the session
    catalog (parquet files under the warehouse dir).  One shuffle now,
    none on any future join against a same-bucketed table."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — carries the bucket spec into the plan."""
    return spark.table(table)


def assert_bucket_local_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> str:
    """Join the two bucketed tables on ``key`` and assert the physical
    plan contains no Exchange (shuffle) — the co-location guarantee.
    Broadcast is disabled for the probe: a broadcast join trivially
    avoids shuffles for SMALL sides and makes the planner bypass the
    bucketed scan entirely, but the property being certified is that
    the join stays shuffle-free when BOTH sides are big — exactly the
    bucket-local merge path.  Returns the formatted plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, left_table).join(
            read_bucketed(spark, right_table), key
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    if "Exchange" in plan:
        raise AssertionError(
            f"bucketed join {left_table} ⋈ {right_table} planned an Exchange "
            f"— bucket specs don't line up:\n{plan}"
        )
    return plan
