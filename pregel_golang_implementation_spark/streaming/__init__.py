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
  - ``compact_edge_table``: cross-batch dedup compaction of the streamed
    table (atomic swap) — run periodically or before a big job.
  - ``streaming_sessionize``: gap sessions as a custom stateful
    operator (``applyInPandasWithState`` + event-time timeout) —
    exactly-once session emission, state bounded by open sessions.
  - ``windowed_event_stats``: watermarked tumbling-window aggregation
    over an event stream (late data beyond the watermark dropped in
    update mode) — the standard curation telemetry shape.

All are testable synchronously in local mode with
``processAllAvailable()``.
"""

from pregel_golang_implementation_spark.streaming.ingest import (
    compact_edge_table,
    edge_stream_ingest,
    streaming_dedup_docs,
    streaming_sessionize,
    windowed_event_stats,
)

__all__ = [
    "compact_edge_table",
    "streaming_sessionize",
    "edge_stream_ingest",
    "streaming_dedup_docs",
    "windowed_event_stats",
]
