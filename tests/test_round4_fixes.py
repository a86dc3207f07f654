"""Round-4 items: NULL-sim top-k safety, fraction edge cases in hash
sampling, order-independent session/window value sums, oracle-twin
robustness for missing JSON props.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.events import (
    event_window_stats,
    sessionize,
)
from pregel_golang_implementation_spark.operators.sampling import hash_sample
from pregel_golang_implementation_spark.operators.similarity import (
    ann_topk,
    cosine_topk,
    knn_graph,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_topk_drops_null_sim_neighbors(spark):
    """A zero-norm embedding has NULL cosine against everything (Spark
    division by zero is NULL); it must never occupy a top-k rank — the
    struct sort used by the two-level top-k would otherwise place NULL
    ``-sim`` FIRST and rank the degenerate vector above every real one."""
    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.5, 0.5]),
            (4, [0.0, 0.0]),  # zero-norm: NULL sim vs everything
        ],
    )
    rows = cosine_topk(emb, query_ids=[1], k=3).collect()
    neighbors = {r["neighbor_id"] for r in rows}
    assert 4 not in neighbors
    assert neighbors == {2, 3}
    # real neighbors keep dense ranks starting at 1
    assert sorted(r["rank"] for r in rows) == [1, 2]
    # and a zero-norm QUERY simply produces no rows (never NULL-ranked junk)
    assert cosine_topk(emb, query_ids=[4], k=3).count() == 0


def test_knn_graph_and_ann_topk_drop_null_sims(spark):
    emb = _emb(
        spark,
        [(i, [float(i), 1.0]) for i in range(1, 6)] + [(9, [0.0, 0.0])],
    )
    for frame in (
        knn_graph(emb, k=3, bits=1),
        ann_topk(emb, query_ids=[1, 2], k=3, bits=1),
    ):
        assert frame.filter(F.col("sim").isNull()).count() == 0
        assert frame.filter(F.col("neighbor_id") == 9).count() == 0


def test_hash_sample_full_and_empty_fractions(spark):
    """fraction >= 1.0 must keep EVERYTHING: the 4-hex-char draw compared
    against the 5-char threshold '10000' silently kept only ~6.25% of
    rows before the short-circuit.  fraction <= 0 is the mirror case."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    assert hash_sample(docs, 1.0).count() == 200
    assert hash_sample(docs, 1.5).count() == 200
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, -0.1).count() == 0
    # interior fractions keep behaving like a real sample
    n = hash_sample(docs, 0.5).count()
    assert 0 < n < 200


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string"
    )


def test_session_sums_are_partition_order_independent(spark):
    """total_value sums doubles whose fp addition is not associative —
    the decimal(38,9) sum makes the rounded result identical under any
    partitioning, so the driver's exact value hash can never flip at a
    partition-order boundary."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # values chosen so naive double summation order visibly matters
    vals = [0.1, 0.2, 0.3, 1e9, -1e9, 0.123456789, 7.7, 1e-7] * 25
    rows = [
        (i, 1, base + dt.timedelta(seconds=10 * i), "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = _events(spark, rows)
    outs = []
    for parts in (1, 7, 32):
        got = sorted(
            sessionize(ev.repartition(parts), gap_minutes=30)
            .select("user_id", "session_no", "total_value")
            .collect()
        )
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    w = []
    for parts in (1, 7, 32):
        w.append(
            sorted(
                event_window_stats(ev.repartition(parts))
                .select("window_start", "total_value")
                .collect()
            )
        )
    assert w[0] == w[1] == w[2]


def test_avg_k_skips_events_without_prop(spark):
    """An event whose props string has no "k" property must be SKIPPED by
    avg_k (not counted as 0, not an error) — and the DuckDB oracle twin
    must agree instead of hard-failing on CAST('' AS BIGINT)."""
    import datetime as dt

    import duckdb

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base, "click", 1.0, '{"k": 4}'),
        (2, 1, base + dt.timedelta(seconds=5), "click", 1.0, '{"other": 9}'),
        (3, 1, base + dt.timedelta(seconds=9), "click", 1.0, '{"k": 8}'),
    ]
    got = (
        event_window_stats(_events(spark, rows))
        .select("avg_k")
        .collect()
    )
    assert len(got) == 1 and got[0]["avg_k"] == pytest.approx(6.0)
    # the twin expression (same shape __spark_entry__ uses) on the same rows
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        "('{\"k\": 4}'), ('{\"other\": 9}'), ('{\"k\": 8}')) t(props)"
    )
    want = con.sql(
        "SELECT AVG(TRY_CAST(NULLIF(regexp_extract(props, '\"k\":\\s*(\\d+)', 1), '') AS BIGINT)) FROM e"
    ).fetchone()[0]
    assert want == pytest.approx(6.0)
