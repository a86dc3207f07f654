"""Streaming surface.

The reference is strictly batch-iterative BSP — its in-flight message
buffering (Worker.go:762-796) is intra-superstep plumbing, not stream
semantics (SURVEY.md §2.2 'streaming': absent).  Incremental graph
maintenance (edge-stream ingestion feeding the batch engine) is planned
for a later round via Structured Streaming foreachBatch into the edge
table; nothing here is on the correctness surface yet.
"""
