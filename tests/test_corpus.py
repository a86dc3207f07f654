"""Corpus → edge-table pipeline: golden edge set, sha256 invariant,
deterministic id assignment (BASELINE.json input_hint + north_star)."""

from __future__ import annotations

from pregel_golang_implementation_spark.operators import pagerank
from pregel_golang_implementation_spark.sources import (
    extract_import_edges,
    synthetic_corpus,
    verify_content_sha256,
)
from pregel_golang_implementation_spark.sources.corpus import (
    assign_vertex_ids,
    corpus_edge_table,
)


def test_extraction_matches_golden_edges(spark):
    corpus, expected, _ = synthetic_corpus(spark, num_repos=3, files_per_repo=25, seed=9)
    got = extract_import_edges(corpus)
    cols = ["src_repo", "src_path", "dst_repo", "dst_path"]
    sym_diff = got.select(cols).exceptAll(expected.select(cols)).count() + expected.select(
        cols
    ).exceptAll(got.select(cols)).count()
    assert sym_diff == 0
    assert got.count() == expected.count()


def test_sha256_invariant_holds_and_detects_tamper(spark):
    corpus, _, manifest = synthetic_corpus(spark, num_repos=2, files_per_repo=10, seed=4)
    assert verify_content_sha256(corpus, manifest).count() == 0
    # tamper one row → exactly one mismatch surfaces
    from pyspark.sql import functions as F

    tampered = corpus.withColumn(
        "content",
        F.when(
            (F.col("repo") == "org/repo-0") & (F.col("path") == "pkg/mod_0.py"),
            F.concat(F.col("content"), F.lit("\n# tampered")),
        ).otherwise(F.col("content")),
    )
    bad = verify_content_sha256(tampered, manifest).collect()
    assert len(bad) == 1 and bad[0]["path"] == "pkg/mod_0.py"


def test_vertex_ids_dense_and_deterministic(spark):
    corpus, _, _ = synthetic_corpus(spark, num_repos=2, files_per_repo=15, seed=4)
    ids1 = {(r["repo"], r["path"]): r["id"] for r in assign_vertex_ids(corpus).collect()}
    ids2 = {(r["repo"], r["path"]): r["id"] for r in assign_vertex_ids(corpus).collect()}
    assert ids1 == ids2
    vals = sorted(ids1.values())
    assert vals == list(range(1, len(vals) + 1))


def test_pagerank_over_corpus_graph(spark):
    corpus, _, _ = synthetic_corpus(spark, num_repos=3, files_per_repo=20, seed=2)
    edges, ids = corpus_edge_table(corpus)
    res = pagerank(spark, edges, tol=1e-6)
    assert res.converged
    total = res.state.groupBy().sum("value").first()[0]
    assert abs(total - 1.0) < 1e-6
