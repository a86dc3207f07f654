"""Round-3 items: benchmark decontamination, repetition quality signals,
default-safe near-dup caps, weighted/personalized PageRank validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.dedup import ngram_containment


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_containment_planted(spark):
    """A benchmark doc fully quoted inside a big corpus doc must score
    containment 1.0 even though Jaccard is tiny; partial overlap scores
    the overlap fraction; disjoint docs produce no row."""
    bench_text = "the quick brown fox jumps over the lazy dog"
    benchmarks = _df(spark, [(0, bench_text)])
    filler = " ".join(f"w{i}" for i in range(60))
    corpus = _df(
        spark,
        [
            # full quote buried in filler → every benchmark 3-gram present
            (100, filler + " " + bench_text + " " + filler),
            # only the first 5 words → 3 of the 7 benchmark 3-grams
            (101, "the quick brown fox jumps " + filler),
            # disjoint
            (102, filler),
        ],
    )
    got = {
        (r["doc_id"], r["benchmark_id"]): r["containment"]
        for r in ngram_containment(corpus, benchmarks, n=3).collect()
    }
    assert got[(100, 0)] == pytest.approx(1.0)
    assert got[(101, 0)] == pytest.approx(3 / 7)
    assert (102, 0) not in got


def test_ngram_containment_asymmetric_vs_jaccard(spark):
    """Containment is per-benchmark-denominator: the same overlap scores
    differently against a small and a large benchmark doc."""
    a = "alpha beta gamma delta"  # 2 3-grams
    b = "alpha beta gamma delta epsilon zeta eta theta"  # 6 3-grams
    benchmarks = _df(spark, [(0, a), (1, b)])
    corpus = _df(spark, [(100, "alpha beta gamma delta " + " ".join(f"x{i}" for i in range(20)))])
    got = {
        (r["doc_id"], r["benchmark_id"]): r["containment"]
        for r in ngram_containment(corpus, benchmarks, n=3).collect()
    }
    assert got[(100, 0)] == pytest.approx(1.0)
    assert got[(100, 1)] == pytest.approx(2 / 6)


def test_ngram_containment_plan_broadcasts_benchmark(spark):
    """Scale shape: BOTH joins (shingle intersect, denominator sizes)
    broadcast the tiny benchmark side — the corpus is never shuffled on
    shingle, and no sort-merge join appears."""
    docs = spark.range(200).selectExpr(
        "id AS doc_id", "concat('w', id, ' w', id+1, ' w', id+2, ' w', id+3) AS text"
    )
    out = ngram_containment(
        docs.filter("doc_id >= 10"), docs.filter("doc_id < 10"), n=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_repetition_signals(spark):
    """Gopher-style repetition gates: a degenerate repetitive document
    scores quality 0 via top_bigram_frac; duplicated lines score via
    dup_line_frac; a normal document passes all gates."""
    from pregel_golang_implementation_spark.operators.textstats import quality_score

    normal = "the quick brown fox jumps over a lazy dog near the old river bank today"
    spammy = " ".join(["buy now"] * 30)  # one bigram dominates
    repeated_lines = "\n".join(["same boilerplate line here"] * 10 + ["unique closing line"])
    docs = _df(spark, [(1, normal), (2, spammy), (3, repeated_lines)])
    got = {r["doc_id"]: r.asDict() for r in quality_score(docs).collect()}

    assert got[1]["quality"] == 1
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["top_bigram_frac"] <= 0.2

    assert got[2]["quality"] == 0
    assert got[2]["top_bigram_frac"] > 0.5  # "now buy" + "buy now" split the mass

    assert got[3]["quality"] == 0
    assert got[3]["dup_line_frac"] == pytest.approx(1 - 2 / 11)


def test_ngram_containment_threshold(spark):
    benchmarks = _df(spark, [(0, "a b c d e f")])
    corpus = _df(spark, [(100, "a b c zzz"), (101, "a b c d e f")])
    got = ngram_containment(corpus, benchmarks, n=3, threshold=0.9).collect()
    assert [(r["doc_id"], r["benchmark_id"]) for r in got] == [(101, 0)]


def test_weighted_pagerank_nonpositive_weights(spark):
    """A src whose weights sum to 0 (or are negative) must not inject
    NaN/Inf: its non-positive edges are dropped, it becomes dangling, and
    total rank mass still sums to 1."""
    import math

    from pregel_golang_implementation_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [
            (1, 2, 3.0),
            (2, 3, 1.0),
            (3, 1, 2.0),
            (4, 1, 5.0), (4, 2, -5.0),  # mixed: negative edge dropped, 5.0 kept
            (5, 1, 2.0), (5, 2, -2.0),  # per-pair rows, sums stay positive per edge
            (6, 1, 0.0),                # zero-outflow src -> dangling
        ],
        "src long, dst long, weight double",
    )
    res = pagerank(spark, edges, weighted=True, tol=1e-10)
    rows = res.state.collect()
    assert all(math.isfinite(r["value"]) for r in rows)
    assert sum(r["value"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    dangling = {r["id"] for r in rows if r["is_dangling"]}
    assert 6 in dangling  # zero outflow -> mass redistributes, not vanishes
    assert 6 in {r["id"] for r in rows}  # the vertex itself is kept


def test_ppr_rejects_missing_source(spark):
    from pregel_golang_implementation_spark.operators.pagerank import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0)], "src long, dst long, weight double"
    )
    with pytest.raises(ValueError, match="not vertices"):
        personalized_pagerank(spark, edges, source_ids=[1, 999])


def test_steps_per_action_clamped(spark):
    from pregel_golang_implementation_spark.operators.connected_components import cc_spec
    from pregel_golang_implementation_spark.plans.runner import (
        MAX_STEPS_PER_ACTION,
        PregelRunner,
    )

    with pytest.warns(UserWarning, match="clamping"):
        r = PregelRunner(spark, cc_spec(), steps_per_action=10)
    assert r.steps_per_action == MAX_STEPS_PER_ACTION


def test_streaming_dedup_parquet_sink_across_restart(spark, tmp_path):
    """Production sink: first-ever docs land in parquet (per-epoch
    overwrite), and the dedup GroupState survives a full query RESTART via
    the checkpoint — a cross-batch duplicate after restart is suppressed."""
    from pyspark.sql import types as T

    from pregel_golang_implementation_spark.streaming import streaming_dedup_docs

    src = str(tmp_path / "doc_stream")
    out_dir = str(tmp_path / "deduped")
    ck = str(tmp_path / "dedup_ck")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )
    spark.createDataFrame(
        [(1, "alpha beta"), (0, "alpha beta"), (2, "gamma delta")],
        "doc_id long, text string",
    ).write.parquet(src + "/b1")
    q = streaming_dedup_docs(
        spark, src + "/*", schema, sink="parquet", output_dir=out_dir, checkpoint_dir=ck
    )
    q.processAllAvailable()
    q.stop()  # full restart below — state must come back from the checkpoint

    spark.createDataFrame(
        [(7, "alpha beta"), (9, "epsilon zeta")], "doc_id long, text string"
    ).write.parquet(src + "/b2")
    q2 = streaming_dedup_docs(
        spark, src + "/*", schema, sink="parquet", output_dir=out_dir, checkpoint_dir=ck
    )
    q2.processAllAvailable()
    q2.stop()

    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out_dir).select("doc_id", "text").collect()
    }
    assert got == {0: "alpha beta", 2: "gamma delta", 9: "epsilon zeta"}


def test_distributed_topk_matches_window_semantics(spark):
    """The two-level partial top-k must reproduce row_number-window
    semantics exactly: (sim desc, neighbor_id asc) with ties broken by
    id, stable under repartitioning, k larger than some groups."""
    import random

    from pregel_golang_implementation_spark.operators.similarity import (
        _distributed_topk,
    )

    rng = random.Random(7)
    rows = []
    for q in range(4):
        for n in range(q * 100, q * 100 + 37):
            # coarse sims force many exact ties
            rows.append((q, n, round(rng.uniform(0, 1), 1)))
    expected = {}
    for q in range(4):
        ranked = sorted(
            [(s, n) for (qq, n, s) in rows if qq == q], key=lambda t: (-t[0], t[1])
        )[:5]
        expected[q] = [(n, s, i + 1) for i, (s, n) in enumerate(ranked)]
    for parts in (1, 7):
        scored = spark.createDataFrame(
            rows, "query_id long, neighbor_id long, sim double"
        ).repartition(parts)
        got = {}
        for r in _distributed_topk(scored, 5).collect():
            got.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["sim"], r["rank"])
            )
        for q in got:
            got[q].sort(key=lambda t: t[2])
        assert got == expected, f"mismatch at {parts} partitions"


def test_hash_sample_and_mix_deterministic(spark):
    """Sampling decisions are pure functions of (salt, key): two runs
    agree row-for-row; fractions land near target; multiplier semantics
    hold (m=2.25 → 2 or 3 copies per doc, m=0 → dropped, salts
    independent)."""
    from pregel_golang_implementation_spark.operators.sampling import (
        hash_sample,
        mix_corpus,
    )

    docs = spark.range(2000).selectExpr(
        "id AS doc_id", "concat('s', id % 2) AS source", "'t' AS text"
    )
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert s1 == s2  # deterministic
    assert 0.25 < len(s1) / 2000 < 0.35
    other = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="val").collect()}
    assert other != s1  # different salt → independent draw

    mixed = mix_corpus(docs, {"s0": 2.25, "s1": 0.0}, on_col="source").collect()
    per_doc = {}
    for r in mixed:
        assert r["source"] == "s0"
        per_doc.setdefault(r["doc_id"], []).append(r["copy_no"])
    assert all(sorted(c) in ([0, 1], [0, 1, 2]) for c in per_doc.values())
    n3 = sum(1 for c in per_doc.values() if len(c) == 3)
    assert 0.15 < n3 / len(per_doc) < 0.35  # ≈25% get the extra copy


def test_sessionize_gap_boundaries(spark):
    """Sessions split exactly when the inter-event gap EXCEEDS the
    threshold (a gap of exactly 30 min stays in-session); session_no is
    1-based per user in time order."""
    from pregel_golang_implementation_spark.operators.events import sessionize

    rows = [
        # user 1: 3 events, gaps 30min (stays) and 30min+1s (splits)
        (0, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
        (1, "2024-01-01 00:30:00", 1, "a", 2.0, "{}"),
        (2, "2024-01-01 01:00:01", 1, "a", 4.0, "{}"),
        # user 2: single event
        (3, "2024-01-01 05:00:00", 2, "b", 8.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["total_value"])
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert got == {(1, 1): (2, 3.0), (1, 2): (1, 4.0), (2, 1): (1, 8.0)}


def test_knn_graph_properties(spark):
    """kNN graph: ≤k ranked neighbors per vector, sims non-increasing in
    rank, no self-loops, and every (vec, neighbor) pair shares an SRP
    bucket (candidates are bucket-mates only)."""
    import random

    from pregel_golang_implementation_spark.operators.similarity import (
        knn_graph,
        srp_buckets,
    )

    rng = random.Random(5)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    rows = knn_graph(emb, k=3, bits=3).collect()
    assert rows, "3-bit buckets over 80 vecs must produce neighbors"
    by_vec = {}
    for r in rows:
        assert r["vec_id"] != r["neighbor_id"]
        by_vec.setdefault(r["vec_id"], []).append((r["rank"], r["sim"]))
    for ranked in by_vec.values():
        ranked.sort()
        assert [rk for rk, _ in ranked] == list(range(1, len(ranked) + 1))
        sims = [s for _, s in ranked]
        assert sims == sorted(sims, reverse=True)
    bucket = {r["vec_id"]: r["bucket"] for r in srp_buckets(emb, bits=3).collect()}
    assert all(bucket[r["vec_id"]] == bucket[r["neighbor_id"]] for r in rows)


def test_audio_decode_real_wav(spark):
    """PCM WAV decodes FOR REAL (stdlib wave + numpy): correct rate /
    duration / rms and energy concentrated in the right FFT band; a
    non-WAV payload degrades per-payload to the stub with decoded=false."""
    import io
    import math
    import wave

    import numpy as np

    from pregel_golang_implementation_spark.operators.multimodal import (
        decode_audio_features,
    )

    rate, secs, freq, amp = 8000, 1.0, 440.0, 0.5
    t = np.arange(int(rate * secs)) / rate
    pcm = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not a wav at all"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r.asDict() for r in decode_audio_features(media).collect()}

    wav = got[1]
    assert wav["decoded"] is True
    assert wav["sample_rate"] == rate and wav["n_channels"] == 1
    assert wav["duration_secs"] == pytest.approx(secs)
    assert wav["rms"] == pytest.approx(amp / math.sqrt(2), rel=1e-3)
    assert wav["zero_crossing_rate"] == pytest.approx(2 * freq / rate, rel=0.01)
    # 440 Hz lands in band 0 of 8 bands over [0, 4000] Hz
    assert wav["features"][0] > 0.9

    junk = got[2]
    assert junk["decoded"] is False and junk["sample_rate"] == 0


def test_netpbm_image_decode_real(spark):
    """Without Pillow, binary netpbm still decodes FOR REAL: a P6 image
    that is half black / half white yields a histogram with mass only in
    the first and last bins; P5 grayscale likewise; garbage falls back
    to the byte stub."""
    import numpy as np

    from pregel_golang_implementation_spark.operators.multimodal import (
        _fake_decode_image,
        _nonpil_decode_image,
    )

    w, h = 4, 2
    raster = bytes([0, 0, 0] * 4 + [255, 255, 255] * 4)
    ppm = b"P6\n# a comment\n4 2\n255\n" + raster
    feats = _nonpil_decode_image(ppm)
    assert feats[0] == pytest.approx(0.5) and feats[-1] == pytest.approx(0.5)
    assert sum(feats[1:-1]) == 0.0

    pgm = b"P5\n4 2\n255\n" + bytes([10] * 4 + [250] * 4)
    g = _nonpil_decode_image(pgm)
    assert g[0] == pytest.approx(0.5) and g[-1] == pytest.approx(0.5)

    junk = b"JFIF not actually parseable"
    assert np.allclose(_nonpil_decode_image(junk), _fake_decode_image(junk))

    # and through the Spark operator end-to-end
    from pregel_golang_implementation_spark.operators.multimodal import decode_features

    media = spark.createDataFrame(
        [(1, bytearray(ppm), "image")], "media_id long, payload binary, media_type string"
    )
    row = decode_features(media, use_pil=False).first()
    assert row["features"][0] == pytest.approx(0.5)


def test_near_dup_default_cap_reports_dropped(spark, caplog):
    """The default-capped composition must surface capped coverage (never
    silent) and, when nothing is capped, match the uncapped result."""
    import logging

    from pregel_golang_implementation_spark.operators.dedup import near_dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _df(
        spark,
        [(i, base + f" tail{i}") for i in range(8)] + [(100, "totally different words here")],
    )
    with caplog.at_level(logging.WARNING):
        capped = near_dup_clusters(docs, threshold=0.3, max_bucket_size=2)
        capped.count()
    assert any("skipped" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING):
        default = {
            (r["doc_id"], r["cluster_id"])
            for r in near_dup_clusters(docs, threshold=0.3).collect()
        }
    assert not any("skipped" in r.message for r in caplog.records)
    uncapped = {
        (r["doc_id"], r["cluster_id"])
        for r in near_dup_clusters(docs, threshold=0.3, max_bucket_size=None).collect()
    }
    assert default == uncapped
    assert any(c == 0 and d != 0 for d, c in default)  # the near-dups clustered
