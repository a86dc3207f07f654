"""Structured-Streaming ingestion into the engine's edge table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def edge_stream_ingest(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Stream edge files (parquet) from ``input_dir`` into the engine's
    edge table at ``table_dir``.

    Per micro-batch: normalize types, drop self-loops, dedup (src,dst)
    within the batch, append.  The streaming checkpoint gives
    exactly-once per source file; cross-batch dedup is left to the
    consumer (the runner's ``_prepare_edges`` handles duplicates
    harmlessly for idempotent combiners, and a periodic compaction can
    ``dropDuplicates`` the table).

    Returns the started StreamingQuery; callers in tests do
    ``q.processAllAvailable(); q.stop()``.
    """
    stream = spark.readStream.schema(EDGE_SCHEMA).parquet(input_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                F.coalesce(F.col("weight"), F.lit(1.0)).cast("double").alias("weight"),
            )
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
            .write.mode("append")
            .parquet(table_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_stats(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    query_name: str = "event_stats",
):
    """Watermarked tumbling-window event aggregation (memory sink, for
    local verification): (window, event_type, n, total_value).  Late rows
    beyond the watermark are dropped — the standard late-data contract."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
