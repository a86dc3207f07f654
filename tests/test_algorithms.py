"""Core algorithm correctness vs sequential oracles (SURVEY.md §5):
allclose(1e-6) for PageRank (BASELINE.json), exact for CC/LPA/SSSP/
triangles."""

from __future__ import annotations

import math
import random

import pytest

from pregel_golang_implementation_spark.operators import (
    connected_components,
    label_propagation,
    pagerank,
    sssp,
    triangle_count,
    triangles_per_vertex,
)
from tests.oracles import (
    oracle_cc,
    oracle_lpa,
    oracle_pagerank,
    oracle_sssp,
    oracle_triangles,
)


def _random_digraph(n=60, m=300, seed=7, weights=False):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    if weights:
        return [(a, b, float(rng.randint(1, 15))) for a, b in sorted(edges)]
    return sorted(edges)


def _to_df(spark, edges, weights=False):
    if weights:
        return spark.createDataFrame(edges, "src long, dst long, weight double")
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )


def test_pagerank_matches_power_iteration(spark):
    edges = _random_digraph(n=50, m=220, seed=3)
    df = _to_df(spark, edges)
    res = pagerank(spark, df, damping=0.85, tol=1e-7, max_supersteps=100)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    want = oracle_pagerank(edges, damping=0.85, tol=1e-9)
    assert res.converged
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_dangling_mass_conserved(spark):
    # star + dangling sinks: vertices 1..5 -> 0, 0 has no out-edges
    edges = [(i, 0) for i in range(1, 6)]
    df = _to_df(spark, edges)
    res = pagerank(spark, df, tol=1e-10, max_supersteps=100)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    want = oracle_pagerank(edges, tol=1e-12)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_connected_components_exact(spark):
    # three islands of different shapes
    edges = (
        [(1, 2), (2, 3), (3, 1)]
        + [(10, 11), (11, 12)]
        + [(20, 21)]
        + _random_digraph(n=30, m=60, seed=5)
    )
    df = _to_df(spark, edges)
    res = connected_components(spark, df)
    got = {r["id"]: int(r["value"]) for r in res.state.collect()}
    want = oracle_cc(edges)
    assert res.converged
    assert got == want


def test_sssp_exact_bellman_ford(spark):
    edges = _random_digraph(n=60, m=400, seed=11, weights=True)
    df = _to_df(spark, edges, weights=True)
    res = sssp(spark, df, source=1)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    want = oracle_sssp(edges, source=1)
    assert res.converged
    assert set(got) == set(want)
    for v in want:
        if math.isinf(want[v]):
            assert math.isinf(got[v])
        else:
            assert got[v] == pytest.approx(want[v], abs=0)


def test_lpa_matches_sequential_sync(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    df = _to_df(spark, edges)
    res = label_propagation(spark, df, max_supersteps=10)
    got = {r["id"]: int(r["value"]) for r in res.state.collect()}
    want = oracle_lpa(edges, max_iter=10)
    assert got == want


def test_triangles_exact(spark):
    edges = _random_digraph(n=40, m=250, seed=13)
    df = _to_df(spark, edges)
    want_total, want_per = oracle_triangles(edges)
    assert triangle_count(spark, df) == want_total
    assert triangle_count(spark, df, degree_order=True) == want_total
    got_per = {
        r["id"]: r["triangles"] for r in triangles_per_vertex(spark, df).collect()
    }
    assert got_per == want_per


def test_frontier_shrinks_and_metrics_recorded(spark):
    # a path graph: SSSP frontier is exactly one vertex per superstep
    edges = [(i, i + 1, 1.0) for i in range(20)]
    df = _to_df(spark, edges, weights=True)
    res = sssp(spark, df, source=0)
    assert res.converged
    assert all(m.active_vertices <= 1 for m in res.metrics)
    assert [m.superstep for m in res.metrics] == list(range(1, len(res.metrics) + 1))
    assert res.total_messages == 20
