"""Sampled betweenness: textbook fixtures + brute-force Brandes sweep."""

from __future__ import annotations

import random
from collections import defaultdict, deque

from pregel_golang_implementation_spark.operators.betweenness import (
    betweenness_sampled,
    brandes_forward,
)
from pregel_golang_implementation_spark.operators.connected_components import symmetrize


def _und(spark, pairs):
    return symmetrize(spark.createDataFrame(pairs, "src long, dst long"))


def _brute_brandes(pairs, pivots, hops):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    bc = defaultdict(float)
    for s in pivots:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == hops:
                continue
            for w in sorted(adj[u]):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = defaultdict(float)
        for w in reversed(order):
            for u in adj[w]:
                if u in dist and dist[u] == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return {v: round(x, 6) for v, x in bc.items() if round(x, 6) > 0}


def test_betweenness_path_graph(spark):
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(
            _und(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), [1], 4
        ).collect()
    }
    assert got == {2: 3.0, 3: 2.0, 4: 1.0}


def test_betweenness_diamond_splits_dependency(spark):
    # two equal shortest paths 1→4 via 2 and 3: each middle gets 0.5
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(
            _und(spark, [(1, 2), (1, 3), (2, 4), (3, 4)]), [1], 4
        ).collect()
    }
    assert got == {2: 0.5, 3: 0.5}


def test_forward_sigma_counts_paths(spark):
    # diamond: vertex 4 is reached by 2 shortest paths from 1
    fwd = {
        (r["id"], r["dist"]): r["sigma"]
        for r in brandes_forward(
            _und(spark, [(1, 2), (1, 3), (2, 4), (3, 4)]), [1], 2
        ).collect()
    }
    assert fwd[(1, 0)] == 1 and fwd[(2, 1)] == 1 and fwd[(4, 2)] == 2


def test_betweenness_matches_brute_force_random(spark):
    rng = random.Random(7)
    n = 30
    pairs = sorted(
        {tuple(sorted(rng.sample(range(n), 2))) for _ in range(70)}
    )
    pivots = [0, 1, 2]
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(
            _und(spark, [(int(a), int(b)) for a, b in pairs]), pivots, 4
        ).collect()
    }
    assert got == _brute_brandes(pairs, pivots, 4)
