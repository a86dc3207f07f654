"""Round-6 optimization equivalence tests.

Every optimization here restructures an operator's internals without
changing its output; each test pins the restructured path to the
original formulation value-for-value.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.dedup import (
    lsh_bands,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_signatures,
    word_shingles,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash"])
def test_fused_bands_equal_signature_pipeline(spark, hash_fn):
    """minhash_bands must reproduce lsh_bands(minhash_signatures(
    word_shingles(...))) exactly: same (doc_id, band, band_key) set —
    the fused path skips the shingle distinct (min is multiset-
    invariant) and the unpivot/regroup, neither of which may change a
    single band key."""
    docs = spark.read.parquet(SF_DOCS)
    sh = word_shingles(docs, n=3)
    sig = minhash_signatures(sh, num_hashes=16, hash_fn=hash_fn)
    want = _rows(lsh_bands(sig, rows_per_band=4), ["doc_id", "band", "band_key"])
    got = _rows(
        minhash_bands(docs, shingle_n=3, num_hashes=16, rows_per_band=4, hash_fn=hash_fn),
        ["doc_id", "band", "band_key"],
    )
    assert got == want


def test_fused_candidate_pairs_unchanged(spark):
    """End-to-end: candidate pairs off the fused bands equal the pairs
    off the original three-shuffle pipeline."""
    docs = spark.read.parquet(SF_DOCS)
    sh = word_shingles(docs, n=3)
    sig = minhash_signatures(sh, num_hashes=16, hash_fn="md5")
    want = _rows(
        lsh_candidate_pairs(lsh_bands(sig, rows_per_band=4)), ["doc_a", "doc_b"]
    )
    got = _rows(
        lsh_candidate_pairs(
            minhash_bands(docs, shingle_n=3, num_hashes=16, rows_per_band=4)
        ),
        ["doc_a", "doc_b"],
    )
    assert got == want


def test_minhash_bands_rejects_uneven_bands(spark):
    docs = spark.read.parquet(SF_DOCS)
    with pytest.raises(ValueError):
        minhash_bands(docs, num_hashes=16, rows_per_band=5)


def test_adaptive_partitioning_resolves_and_matches_explicit(spark):
    """r6: with num_partitions=None the runner sizes the layout from the
    edge count — min(conf, max(8, ceil(E / 75k))) — and the result is
    value-identical to an explicit-partitions run (all combiners are
    partition-order-insensitive or rounded downstream)."""
    import math

    from pyspark.sql import functions as F

    from pregel_golang_implementation_spark.operators.connected_components import (
        cc_spec,
        symmetrize,
    )
    from pregel_golang_implementation_spark.plans.runner import PregelRunner
    from pregel_golang_implementation_spark.sources.graphs import synthetic_edges

    edges = symmetrize(
        synthetic_edges(spark, num_vertices=3000, avg_degree=4, seed=11),
        dedup=False,
    ).persist()
    n_edges = edges.count()
    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    expect = min(
        conf,
        max(PregelRunner.MIN_PARTITIONS, math.ceil(n_edges / PregelRunner.EDGES_PER_PARTITION)),
    )
    adaptive = PregelRunner(spark, cc_spec())
    res_a = adaptive.run(edges)
    assert adaptive.num_partitions == expect
    explicit = PregelRunner(spark, cc_spec(), num_partitions=conf)
    res_e = explicit.run(edges)
    a = sorted(tuple(r) for r in res_a.state.select("id", "value").collect())
    e = sorted(tuple(r) for r in res_e.state.select("id", "value").collect())
    edges.unpersist()
    assert a == e
    assert res_a.supersteps == res_e.supersteps


def test_streaming_sessionize_out_of_order_cross_batch(spark, tmp_path):
    """ADVICE r5: a within-watermark event EARLIER than the open
    session's start must either extend the session backwards (start =
    min) or close as its own earlier session — the old fold silently
    merged it and kept the wrong start_ts."""
    import datetime as _dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pregel_golang_implementation_spark.streaming import streaming_sessionize

    src = str(tmp_path / "sess_ooo")
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

    def ep(s):
        return int(
            _dt.datetime.fromisoformat(s)
            .replace(tzinfo=_dt.timezone.utc)
            .timestamp()
        )

    write([("2026-01-01 01:00:00", 1, 4.0)], "overwrite")
    q = streaming_sessionize(
        spark, src, schema, gap_minutes=30, watermark="120 minutes",
        query_name="sess_ooo_test",
    )
    q.processAllAvailable()
    # batch 2, both within the generous watermark but EARLIER than the
    # open session's start: 00:05 is > gap before it (own session,
    # closed), 00:50 is within gap (extends the open session backwards)
    write(
        [("2026-01-01 00:05:00", 1, 5.0), ("2026-01-01 00:50:00", 1, 6.0)],
        "append",
    )
    q.processAllAvailable()
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM sess_ooo_test ORDER BY start_ts"
        ).collect()
    ]
    assert got == [(1, ep("2026-01-01 00:05:00"), ep("2026-01-01 00:05:00"), 1, 5.0)]
    # flush the open session via the event-time timeout and check its
    # back-extended start
    write([("2026-01-01 09:00:00", 99, 9.0)], "append")
    q.processAllAvailable()
    write([("2026-01-01 10:00:00", 99, 9.0)], "append")
    q.processAllAvailable()
    q.stop()
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM sess_ooo_test ORDER BY start_ts"
        ).collect()
    ]
    assert (1, ep("2026-01-01 00:50:00"), ep("2026-01-01 01:00:00"), 2, 10.0) in got


def test_edge_layout_order_is_deterministic(spark):
    """r6 fix: the runner's cached edge layout is sorted within
    partitions, so its row order is a function of the data alone — not of
    shuffle-fetch interleaving in the CALLER's prep plan.  Two
    independent prepares of the same lineage must agree partition by
    partition, row by row; this is what keeps every float message-sum
    downstream (slim vs classic combine, chained vs unchained, resume vs
    cold) bit-identical across runs."""
    from pyspark.sql import functions as F

    from pregel_golang_implementation_spark.operators.pagerank import (
        pagerank_spec,
        prepare_pagerank_graph,
    )
    from pregel_golang_implementation_spark.plans.runner import PregelRunner
    from pregel_golang_implementation_spark.sources.graphs import synthetic_edges

    edges = synthetic_edges(spark, num_vertices=300, avg_degree=4, seed=7)
    pr_edges, vertices = prepare_pagerank_graph(edges)
    n = vertices.count()

    def layout():
        runner = PregelRunner(spark, pagerank_spec(n))
        e = runner._prepare_edges(pr_edges)
        rows = [
            tuple(r)
            for r in e.withColumn("p", F.spark_partition_id())
            .select("p", "src", "dst", "weight")
            .collect()
        ]
        e.unpersist()
        return rows

    assert layout() == layout()  # exact order, not just multiset
