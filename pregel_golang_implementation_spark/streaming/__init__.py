"""Streaming surface: incremental graph maintenance.

The reference is strictly batch-iterative BSP — its in-flight message
buffering (Worker.go:762-796) is intra-superstep plumbing, not stream
semantics (SURVEY.md §2.2 'streaming': absent).  What a production
link-graph deployment actually needs from streams is INGESTION: edges
arriving continuously, landing in the edge table the batch engine
iterates over.  This module provides that via Structured Streaming:

  - ``edge_stream_ingest``: file-source stream → normalized edge rows →
    ``foreachBatch`` append with in-batch dedup, exactly-once per batch
    via the streaming checkpoint.
  - ``windowed_event_stats``: watermarked tumbling-window aggregation
    over an event stream (late data tolerated up to the watermark) —
    the standard curation telemetry shape.

Both are testable synchronously in local mode with
``processAllAvailable()``.
"""

from pregel_golang_implementation_spark.streaming.ingest import (
    edge_stream_ingest,
    windowed_event_stats,
)

__all__ = ["edge_stream_ingest", "windowed_event_stats"]
