"""Slow-but-obviously-correct sequential oracles (SURVEY.md §5):
power-iteration PageRank, union-find CC, synchronous LPA, brute-force
triangles, Bellman-Ford SSSP — same strategy as the reference's
Test/bellmanford.py golden generator, but seeded and in-repo."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def oracle_pagerank(edges: list[tuple[int, int]], damping=0.85, tol=1e-6, max_iter=200):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = defaultdict(list)
    for s, d in set(edges):
        out[s].append(d)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        dangling = sum(rank[v] for v in nodes if not out[v])
        nxt = {v: 0.0 for v in nodes}
        for s in nodes:
            if out[s]:
                share = rank[s] / len(out[s])
                for d in out[s]:
                    nxt[d] += share
        new = {
            v: (1 - damping) / n + damping * (nxt[v] + dangling / n) for v in nodes
        }
        delta = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if delta < tol:
            break
    return rank


def oracle_cc(edges: list[tuple[int, int]]):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def oracle_sssp(edges: list[tuple[int, int, float]], source: int):
    """Bellman-Ford, |V|-1 rounds — mirrors reference Test/bellmanford.py:7-26."""
    nodes = {u for e in edges for u in e[:2]}
    dist = {v: math.inf for v in nodes}
    dist[source] = 0.0
    for _ in range(len(nodes) - 1):
        changed = False
        for s, d, w in edges:
            if dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


def oracle_lpa(edges: list[tuple[int, int]], max_iter=20):
    """Synchronous LPA over the undirected graph: each round every vertex
    adopts the most frequent label among all neighbors, ties → smallest
    label; isolated vertices keep their own."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted({u for e in edges for u in e})
    label = {v: v for v in nodes}
    for _ in range(max_iter):
        new = {}
        for v in nodes:
            if not adj[v]:
                new[v] = label[v]
                continue
            counts = Counter(label[u] for u in adj[v])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == label:
            break
        label = new
    return label


def oracle_triangles(edges: list[tuple[int, int]]):
    """Brute force over the canonical src<dst set. Returns (global, per-vertex)."""
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    per = Counter()
    total = 0
    for a, b in canon:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counted once
                total += 1
                per[a] += 1
                per[b] += 1
                per[c] += 1
    return total, dict(per)
