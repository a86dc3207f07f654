"""Structured-Streaming ingestion into the engine's edge table."""

from __future__ import annotations

import os

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

# Transactional-table-format escape hatch (same probe pattern as the
# multimodal codec upgrades): when delta-spark is importable — its jars
# ship with the pip package and must be on the session's classpath via
# spark.sql.extensions — the edge table can be a Delta table and
# compaction becomes one snapshot-isolated commit instead of the careful
# file-level protocol below.  Not in this image; the probe keeps the
# deployment story honest without a hard dependency.
try:  # pragma: no cover - exercised only where delta-spark is installed
    from delta.tables import DeltaTable as _DeltaTable

    HAS_DELTA = True
except ImportError:
    _DeltaTable = None
    HAS_DELTA = False


# Delta's optimistic-concurrency conflicts, by class name (delta.exceptions
# mirrors io.delta.exceptions): these — and ONLY these — are the retryable
# outcomes of racing a concurrent append.  Matched by name because the
# classes only exist where delta-spark is installed.
_DELTA_CONFLICT_CLASSES = frozenset(
    {
        "ConcurrentModificationException",
        "ConcurrentAppendException",
        "ConcurrentWriteException",
        "ConcurrentDeleteReadException",
        "ConcurrentDeleteDeleteException",
        "ConcurrentTransactionException",
        "MetadataChangedException",
        "ProtocolChangedException",
    }
)


def _is_delta_conflict(exc: BaseException) -> bool:
    """True iff ``exc`` is a Delta optimistic-concurrency conflict —
    deterministic failures (schema mismatch, permissions, missing table)
    must surface immediately, not burn retries masquerading as races."""
    for klass in type(exc).__mro__:
        if klass.__name__ in _DELTA_CONFLICT_CLASSES:
            return True
    # captured JVM exceptions name the Java class somewhere in the text —
    # at the head for CapturedException ("io.delta.exceptions.Concurrent
    # AppendException: ...") but mid-string for a raw Py4JJavaError ("An
    # error occurred while calling o123.save.\n: io.delta...").  Scan the
    # whole message for the qualified conflict classes (ADVICE r5) —
    # substring match on the delta-qualified name, so an unrelated error
    # that merely MENTIONS 'ConcurrentAppendException' in prose would
    # still need the io.delta/delta.exceptions prefix to count.
    text = str(exc)
    head = text.split(":", 1)[0]
    if head.rsplit(".", 1)[-1].strip() in _DELTA_CONFLICT_CLASSES:
        return True
    return any(
        f"delta.exceptions.{name}" in text for name in _DELTA_CONFLICT_CLASSES
    )


def edge_stream_ingest(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    table_format: str = "parquet",
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
            .format(table_format)  # "delta" when the jars are present
            .save(table_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_edge_table(
    spark: SparkSession, table_dir: str, table_format: str = "parquet"
) -> int:
    """Cross-batch dedup compaction for the streamed edge table: collapse
    to one row per (src, dst) with the min weight (matching
    ``edges_from_lineitem``'s deterministic-weight rule).

    The streaming sink dedups only within a micro-batch; run this
    periodically (or before a big job) to collapse duplicates across
    batches.  File-level, append-safe protocol — the table directory is
    never swapped out:

      1. snapshot the list of data files present NOW;
      2. compact exactly those files into new uniquely-named files;
      3. move the new files in, then delete only the snapshotted ones.

    A micro-batch appended DURING compaction is untouched (its files are
    not in the snapshot), so no ingested row is ever lost and the
    directory always exists.  A concurrent reader may transiently see a
    row twice (old file + compacted copy) in the brief move-in window —
    the pre-compaction duplicate state, which every consumer of this
    table already tolerates.

    ``table_format="delta"`` (requires delta-spark — jars not in this
    image; probe with ``HAS_DELTA``) replaces the whole protocol with
    one snapshot-isolated transactional overwrite: readers see either
    the old or the compacted snapshot, never the move-in window, and a
    micro-batch that commits an append concurrently makes the overwrite
    fail with a conflict, which is retried against the fresh snapshot —
    so the appended rows are always either in the compaction input or
    untouched on top of it.  Returns the compacted row count."""
    import shutil
    import uuid

    if table_format == "delta":  # pragma: no cover - needs delta-spark jars
        if not HAS_DELTA:
            raise RuntimeError(
                "compact_edge_table(table_format='delta') needs delta-spark "
                "importable and its SQL extension configured on the session"
            )
        for attempt in range(3):
            try:
                compacted = (
                    spark.read.format("delta")
                    .load(table_dir)
                    .groupBy("src", "dst")
                    .agg(F.min("weight").alias("weight"))
                )
                compacted.write.format("delta").mode("overwrite").save(table_dir)
                return spark.read.format("delta").load(table_dir).count()
            except Exception as exc:
                # retry ONLY optimistic-concurrency conflicts with a
                # concurrent append (against the fresh snapshot); any
                # deterministic failure — schema mismatch, permissions,
                # missing table — surfaces immediately
                if not _is_delta_conflict(exc):
                    raise
                if attempt == 2:
                    raise
        raise AssertionError("unreachable")

    snapshot = sorted(
        name
        for name in os.listdir(table_dir)
        if name.endswith(".parquet") and not name.startswith(".")
    )
    if not snapshot:
        return 0
    compacted = (
        spark.read.parquet(*[os.path.join(table_dir, f) for f in snapshot])
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    tmp = table_dir.rstrip("/") + f".compact-{uuid.uuid4().hex[:8]}.tmp"
    compacted.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    tag = uuid.uuid4().hex[:8]
    for i, name in enumerate(
        f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
    ):
        os.rename(
            os.path.join(tmp, name),
            os.path.join(table_dir, f"compact-{tag}-{i:05d}.parquet"),
        )
    for name in snapshot:
        os.remove(os.path.join(table_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def streaming_dedup_docs(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "stream_dedup",
    sink: str = "memory",
    output_dir: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Cross-batch STREAMING exact dedup as a custom stateful operator
    (``applyInPandasWithState``): per content-hash state counts how many
    copies have been seen across all batches; a document is emitted only
    the first time its content appears, ever (min id within the first
    batch for determinism).

    This is the dedup-on-ingest complement to ``compact_edge_table``'s
    dedup-on-read: arriving duplicates never land downstream at all.
    State is one counter per distinct content hash — bounded by the
    number of DISTINCT documents, and keyed by the same md5 the batch
    engine's ``exact_duplicates`` uses.  (Spark's built-in streaming
    ``dropDuplicates`` could express emit-first-ever too; the explicit
    GroupState form is the extension point for richer policies — keep-
    shortest, quality-gated, count-weighted — that built-ins cannot.)

    Sinks: ``sink="memory"`` (default) keeps results in a queryable
    in-memory table — local verification only.  ``sink="parquet"`` is the
    deployable path: foreachBatch writes each micro-batch's first-ever
    docs to ``output_dir/epoch=<id>/`` with per-epoch OVERWRITE, so a
    replayed batch (failure recovery) rewrites its own epoch directory
    instead of appending duplicates — idempotent, effectively
    exactly-once downstream without a transactional table format.
    Readers do ``spark.read.parquet(output_dir)`` (the epoch shows up as
    a partition column).  Requires ``output_dir`` and ``checkpoint_dir``
    (the checkpoint carries BOTH the source offsets and the dedup
    GroupState, so a restarted query resumes suppression across
    restarts).  Returns the started query.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(input_dir)
    keyed = stream.withColumn("_h", F.md5(F.col(text_col)))

    def emit_first(key, pdf_iter, state):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        best = None  # min-id row of THIS batch, only relevant if seen == 0
        n_batch = 0
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            n_batch += len(pdf)
            if seen == 0:
                cand = pdf.sort_values(id_col).iloc[[0]]
                if best is None or cand[id_col].iloc[0] < best[id_col].iloc[0]:
                    best = cand
        state.update((seen + n_batch,))
        if seen == 0 and best is not None:
            yield best[[id_col, text_col]]

    out = keyed.groupBy("_h").applyInPandasWithState(
        emit_first,
        outputStructType=f"{id_col} long, {text_col} string",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if sink == "parquet":
        if not output_dir or not checkpoint_dir:
            raise ValueError(
                "sink='parquet' needs output_dir and checkpoint_dir "
                "(offsets + dedup state live in the checkpoint)"
            )

        def write_batch(batch: DataFrame, epoch_id: int) -> None:
            if batch.isEmpty():
                return
            batch.write.mode("overwrite").parquet(
                os.path.join(output_dir, f"epoch={epoch_id}")
            )

        return (
            out.writeStream.outputMode("append")
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )
    if sink != "memory":
        raise ValueError(f"unknown sink {sink!r} (memory | parquet)")
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def windowed_event_stats(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    query_name: str = "event_stats",
    output_mode: str = "update",
):
    """Watermarked tumbling-window event aggregation (memory sink, for
    local verification): (window, event_type, n, total_value).

    Default ``update`` mode honors the late-data contract: rows later than
    the watermark are dropped and finalized window state is evicted
    (bounded state — the 100 TB requirement).  NOTE the memory sink in
    update mode holds the UPDATE CHANGELOG: every trigger appends the
    rows it updated, so a window spanning multiple triggers appears once
    per update — read the latest update per (window, event_type), or use
    a real sink (foreachBatch upsert) in production; this helper exists
    to verify drop/keep semantics locally.  ``complete`` mode keeps the
    memory table to exactly-current aggregates instead, but then Spark
    retains ALL window state forever and the watermark is inert (late
    rows still aggregated) — only for small verification runs."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    query_name: str = "stream_sessions",
):
    """Cross-batch gap sessionization as a custom stateful streaming
    operator — the streaming twin of ``events.sessionize`` and the
    textbook use of ``applyInPandasWithState`` with an EVENT-TIME
    timeout (Structured Streaming has no built-in session window with a
    per-key gap close + single final emission).

    Per user_id the state holds one OPEN session (start/end epoch
    seconds, event count, value sum).  Each micro-batch folds that
    user's new events in event-time order: a gap > ``gap_minutes``
    closes the open session (emitted immediately) and starts a new one.
    The state's timeout is re-armed to ``session_end + gap`` on every
    update, so when the WATERMARK passes that point with no new events,
    the function is invoked once more for the timed-out key and emits
    the final session — sessions are emitted EXACTLY once, state is
    evicted on close, and total state is bounded by the number of
    concurrently-open sessions (the 100 TB requirement; a hot user costs
    one small tuple, not an event buffer).

    Late events older than the watermark are dropped by the engine
    before they reach the function — same contract as
    ``windowed_event_stats``.  Events inside one batch may arrive
    unsorted (sorted here); events for one session split across batches
    merge through the state.  Memory sink, local verification.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = gap_minutes * 60
    stream = spark.readStream.schema(schema).parquet(input_dir)
    # the watermarked column itself must survive into the grouped frame —
    # event-time timeout is rejected if the projection drops it
    keyed = stream.withWatermark("ts", watermark).select(
        "user_id",
        F.col("ts"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("_ep"),
        "value",
    )

    def fold_sessions(key, pdf_iter, state):
        import pandas as pd

        (uid,) = key
        if state.hasTimedOut:
            s, e, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": uid,
                        "start_ts": s,
                        "end_ts": e,
                        "n_events": n,
                        "total_value": v,
                    }
                ]
            )
            return
        cur = list(state.get) if state.exists else None
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        if len(rows) == 0 and cur is None:
            return
        # Interval sweep over the sorted union of the open-session summary
        # and this batch's events (ADVICE r5): a within-watermark event
        # EARLIER than the open session's start either extends the session
        # backwards (start = min) or — when it precedes it by more than the
        # gap — forms its own earlier session, exactly what the batch twin
        # (events.sessionize) would emit.  The old fold compared gaps only
        # against the session END and never lowered start_ts.
        atoms = [tuple(cur)] if cur is not None else []
        atoms += [
            (int(ep), int(ep), 1, float(val))
            for ep, val in rows[["_ep", "value"]].itertuples(index=False)
        ]
        atoms.sort(key=lambda a: (a[0], a[1]))
        merged: list[list] = []
        for s, e, n, v in atoms:
            if merged and s - merged[-1][1] <= gap:
                m = merged[-1]
                m[1] = max(m[1], e)
                m[2] += n
                m[3] += v
            else:
                merged.append([s, e, n, v])
        closed = [tuple(m) for m in merged[:-1]]
        cur = merged[-1]
        state.update(tuple(cur))
        # close the open session when event time goes quiet past the gap
        state.setTimeoutTimestamp((cur[1] + gap) * 1000)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": uid,
                        "start_ts": s,
                        "end_ts": e,
                        "n_events": n,
                        "total_value": v,
                    }
                    for (s, e, n, v) in closed
                ]
            )

    out = keyed.groupBy("user_id").applyInPandasWithState(
        fold_sessions,
        outputStructType=(
            "user_id long, start_ts long, end_ts long, "
            "n_events long, total_value double"
        ),
        stateStructType=(
            "start_ts long, end_ts long, n_events long, total_value double"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def upsert_gold_stats(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    table_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    buckets: int = 16,
):
    """PRODUCTION sink for the windowed aggregate: a ``foreachBatch``
    idempotent key-upsert into a bucket-partitioned parquet gold table —
    the real-sink counterpart the ``windowed_event_stats`` memory-sink
    docstring points at.

    Each micro-batch delivers the (window_start, event_type) rows whose
    aggregates changed (update mode).  The upsert:

      1. skips replayed batches — ``_COMMITTED`` records the last applied
         batch id, so after a crash between sink-write and source-commit
         the re-delivered batch is a no-op (exactly-once on top of
         at-least-once delivery, the standard foreachBatch discipline);
      2. touches only the hash-buckets containing changed keys: existing
         rows are read with a bucket-pruned scan, changed keys replaced
         (anti-join + union), and ONLY those bucket partitions are
         rewritten via dynamic partition overwrite — per-batch cost
         scales with the batch's key spread, not the table size;
      3. when delta-spark is importable (``HAS_DELTA`` probe, same
         pattern as compaction above) a deployment would swap steps 1-2
         for ``DeltaTable.merge`` — one snapshot-isolated MERGE, no
         manual bucket bookkeeping.

    Readers see the gold table as plain parquet keyed by (window_start,
    event_type); concurrent reads during an overwrite see the previous
    files of a bucket until the atomic directory swap (same visibility
    class as compact_edge_table's protocol).
    """
    marker = os.path.join(table_dir, "_COMMITTED")

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # replayed batch — already applied
        changed = (
            batch_df.select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
                "total_value",
            )
            .withColumn(
                "bucket",
                F.pmod(F.hash("window_start", "event_type"), F.lit(buckets)),
            )
            .localCheckpoint(eager=True)  # batch frame is consumed 3×
        )
        touched = [r["bucket"] for r in changed.select("bucket").distinct().collect()]
        if not touched:
            return
        data_dir = os.path.join(table_dir, "data")
        if os.path.isdir(data_dir):
            current = sess.read.parquet(data_dir).filter(
                F.col("bucket").isin(touched)
            )
            keep = current.join(
                changed.select("window_start", "event_type"),
                ["window_start", "event_type"],
                "left_anti",
            )
            # pin before writing — the overwrite target is also the scan
            # source, and Spark (rightly) refuses to overwrite a path it
            # is still lazily reading from
            merged = keep.unionByName(changed).localCheckpoint(eager=True)
        else:
            merged = changed
        (
            merged.repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(data_dir)
        )
        os.makedirs(table_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)  # atomic commit marker (O19 discipline)

    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
