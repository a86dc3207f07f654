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


def test_streaming_sessionize_gap_and_timeout(spark, tmp_path):
    from pregel_golang_implementation_spark.streaming import streaming_sessionize

    src = str(tmp_path / "sess_events")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )

    def write(rows, mode):
        spark.createDataFrame(
            rows, "ts string, user_id long, value double"
        ).select(F.col("ts").cast("timestamp"), "user_id", "value").write.mode(
            mode
        ).parquet(src)

    # batch 1: user 1 has two sessions split by a >30-min gap (second
    # session closes the first IN-batch); the second stays open
    write(
        [
            ("2026-01-01 00:00:00", 1, 1.0),
            ("2026-01-01 00:10:00", 1, 2.0),
            ("2026-01-01 01:00:00", 1, 4.0),
        ],
        "overwrite",
    )
    q = streaming_sessionize(
        spark, src, schema, gap_minutes=30, watermark="5 minutes",
        query_name="sess_test",
    )
    q.processAllAvailable()
    got = [tuple(r) for r in spark.sql("SELECT * FROM sess_test ORDER BY start_ts").collect()]
    import datetime as _dt

    def ep(s):
        # UTC explicitly — the Spark session pins timeZone=UTC, and a
        # naive .timestamp() would apply the box's local zone instead
        return int(
            _dt.datetime.fromisoformat(s)
            .replace(tzinfo=_dt.timezone.utc)
            .timestamp()
        )

    assert got == [(1, ep("2026-01-01 00:00:00"), ep("2026-01-01 00:10:00"), 2, 3.0)]

    # batches 2+3: a much-later event from ANOTHER user advances the
    # watermark past user 1's (end + gap) timeout → the open session is
    # emitted exactly once via the event-time timeout path
    write([("2026-01-01 05:00:00", 99, 9.0)], "append")
    q.processAllAvailable()
    write([("2026-01-01 06:00:00", 99, 9.0)], "append")
    q.processAllAvailable()
    q.stop()
    got = [tuple(r) for r in spark.sql("SELECT * FROM sess_test ORDER BY start_ts").collect()]
    assert (1, ep("2026-01-01 01:00:00"), ep("2026-01-01 01:00:00"), 1, 4.0) in got
    # no duplicate emission of the first session
    assert len([g for g in got if g[0] == 1]) == 2


def test_upsert_gold_stats_merges_and_is_idempotent(spark, tmp_path):
    from pregel_golang_implementation_spark.streaming.ingest import upsert_gold_stats

    src = str(tmp_path / "gold_events")
    table = str(tmp_path / "gold_table")
    ck = str(tmp_path / "gold_ck")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )

    def write(rows, mode):
        spark.createDataFrame(
            rows, "ts string, event_type string, value double"
        ).select(F.col("ts").cast("timestamp"), "event_type", "value").write.mode(
            mode
        ).parquet(src)

    write(
        [
            ("2026-01-01 00:01:00", "view", 1.0),
            ("2026-01-01 00:02:00", "view", 2.0),
            ("2026-01-01 00:01:30", "click", 5.0),
        ],
        "overwrite",
    )
    q = upsert_gold_stats(
        spark, src, schema, table, ck, window="5 minutes", watermark="5 minutes"
    )
    q.processAllAvailable()
    # same window updated by a later batch: count/total must be MERGED
    # (replaced), not duplicated
    write([("2026-01-01 00:03:00", "view", 4.0)], "append")
    q.processAllAvailable()
    q.stop()
    import os

    got = {
        (r["event_type"],): (r["n"], r["total_value"])
        for r in spark.read.parquet(os.path.join(table, "data")).collect()
    }
    assert got[("view",)] == (3, 7.0)
    assert got[("click",)] == (1, 5.0)

    # restarting from the same checkpoint must not re-apply anything
    q2 = upsert_gold_stats(
        spark, src, schema, table, ck, window="5 minutes", watermark="5 minutes"
    )
    q2.processAllAvailable()
    q2.stop()
    again = {
        (r["event_type"],): (r["n"], r["total_value"])
        for r in spark.read.parquet(os.path.join(table, "data")).collect()
    }
    assert again == got
