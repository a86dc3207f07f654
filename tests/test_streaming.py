"""Streaming ingestion tests (synchronous via availableNow/memory sink)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pregel_golang_implementation_spark.operators import connected_components
from pregel_golang_implementation_spark.streaming import (
    edge_stream_ingest,
    windowed_event_stats,
)


def test_edge_stream_ingest_feeds_batch_engine(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    table = str(tmp_path / "edges_table")
    ck = str(tmp_path / "stream_ck")
    # two "arriving" files, with an intra-batch duplicate and a self-loop
    spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (2, 3, 1.0), (4, 4, 1.0)],
        "src long, dst long, weight double",
    ).write.parquet(src_dir + "/batch1")
    spark.createDataFrame(
        [(10, 11, None)], "src long, dst long, weight double"
    ).write.parquet(src_dir + "/batch2")

    q = edge_stream_ingest(spark, src_dir + "/*", table, ck)
    q.processAllAvailable()
    q.stop()

    edges = spark.read.parquet(table)
    rows = {(r["src"], r["dst"], r["weight"]) for r in edges.collect()}
    assert rows == {(1, 2, 1.0), (2, 3, 1.0), (10, 11, 1.0)}

    # the ingested table drives the batch engine directly
    res = connected_components(spark, edges)
    comp = {r["id"]: int(r["value"]) for r in res.state.collect()}
    assert comp[3] == 1 and comp[11] == 10


def test_windowed_event_stats_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    spark.createDataFrame(
        [
            ("2026-01-01 00:01:00", "click", 1.0),
            ("2026-01-01 00:02:00", "click", 2.0),
            ("2026-01-01 00:07:00", "view", 5.0),
        ],
        "ts string, event_type string, value double",
    ).select(F.col("ts").cast("timestamp"), "event_type", "value").write.parquet(src)

    q = windowed_event_stats(spark, src, schema, query_name="evt_test")
    q.processAllAvailable()
    q.stop()
    out = {
        (r["window"]["start"].minute, r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM evt_test").collect()
    }
    assert out[(0, "click")] == (2, 3.0)
    assert out[(5, "view")] == (1, 5.0)
