"""Round-5 batch 4: SCC (trim + FW/BW peel), Lloyd k-means, ROLLUP/CUBE
aggregates, Adamic–Adar link prediction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.connected_components import symmetrize
from pregel_golang_implementation_spark.operators.kmeans import kmeans_assign
from pregel_golang_implementation_spark.operators.link_prediction import (
    adamic_adar_topk,
)
from pregel_golang_implementation_spark.operators.relational import (
    docs_cube,
    revenue_rollup,
)
from pregel_golang_implementation_spark.operators.scc import scc_fwbw


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ------------------------------------------------------------------- scc

def _scc_map(spark, pairs, **kw):
    out = scc_fwbw(spark, _edges(spark, pairs), **kw)
    return {r["id"]: r["scc"] for r in out.collect()}


def test_scc_two_cycles_and_bridge(spark):
    # cycle {1,2,3} → bridge 3→4 → cycle {4,5}; 6 dangles off 5
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6)]
    m = _scc_map(spark, pairs, inner_iters=8, trim_rounds=3, outer_rounds=2)
    assert m[1] == m[2] == m[3] == 1
    assert m[4] == m[5] == 4
    assert m[6] == 6
    assert len(m) == 6


def test_scc_dag_is_all_singletons(spark):
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    m = _scc_map(spark, pairs, inner_iters=6, trim_rounds=6)
    assert m == {v: v for v in range(1, 6)}


def test_scc_single_big_cycle(spark):
    n = 20
    pairs = [(i, (i + 1) % n) for i in range(n)]
    m = _scc_map(spark, pairs, inner_iters=n + 1)
    assert set(m.values()) == {0} and len(m) == n


def test_scc_strict_raises_when_budget_too_small(spark):
    # two cycles X={5,6} → Y={7,8}: Y's f-labels see 5 through the bridge
    # (f=5) but b stays 7, so round 1 peels only X — one outer round with
    # strict must raise, strict=False must return the partial labeling
    pairs = [(5, 6), (6, 5), (7, 8), (8, 7), (5, 7)]
    m = _scc_map(
        spark, pairs, inner_iters=6, trim_rounds=0, outer_rounds=1, strict=False
    )
    # one peel round: f(7)=5 ≠ b(7)=7 → {7,8} unassigned, {5,6} peeled
    assert m[5] == 5 and m[6] == 5
    assert 7 not in m and 8 not in m
    with pytest.raises(ValueError, match="unassigned"):
        scc_fwbw(
            spark,
            _edges(spark, pairs),
            inner_iters=6,
            trim_rounds=0,
            outer_rounds=1,
            strict=True,
        ).count()


def test_scc_second_round_finishes_peel(spark):
    pairs = [(5, 6), (6, 5), (7, 8), (8, 7), (5, 7)]
    m = _scc_map(spark, pairs, inner_iters=6, trim_rounds=2, outer_rounds=2)
    assert m[5] == m[6] == 5
    assert m[7] == m[8] == 7


# ---------------------------------------------------------------- kmeans

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separable_clusters(spark):
    # two tight blobs in 4d; seeds 0 and 1 land one in each blob
    blob_a = [[0.0, 0.1, 0.0, 0.05], [0.1, 0.0, 0.02, 0.0], [0.05, 0.05, 0.0, 0.1]]
    blob_b = [[5.0, 5.1, 5.0, 4.9], [5.1, 4.95, 5.0, 5.0], [4.9, 5.0, 5.05, 5.0]]
    vecs = [blob_a[0], blob_b[0], blob_a[1], blob_a[2], blob_b[1], blob_b[2]]
    out = kmeans_assign(_emb_df(spark, vecs), k=2, iters=2, dim=4)
    cl = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert cl[0] == cl[2] == cl[3] == 0
    assert cl[1] == cl[4] == cl[5] == 1


def test_kmeans_empty_cluster_keeps_seed(spark):
    # identical seeds: every point ties → cluster 0 (smaller index wins),
    # cluster 1 goes empty and must keep its previous centroid without
    # crashing or emitting NULL coordinates
    vecs = [[0.0, 0.0], [0.0, 0.0], [0.1, 0.0], [0.0, 0.1]]
    out = kmeans_assign(_emb_df(spark, vecs), k=2, iters=2, dim=2)
    cl = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert len(cl) == 4
    assert all(c in (0, 1) for c in cl.values())
    # iteration 1: every point ties to the identical seeds → cluster 0,
    # cluster 1 is empty and keeps [0,0]; the retained centroid then wins
    # the exact-origin points back in the next assignment
    assert cl[0] == 1 and cl[1] == 1


def test_kmeans_missing_seed_raises(spark):
    df = _emb_df(spark, [[0.0, 0.0]])
    with pytest.raises(ValueError, match="seed"):
        kmeans_assign(df, k=3, iters=1, dim=2)


# ------------------------------------------------------------ rollup/cube

def test_revenue_rollup_levels(spark):
    li = spark.createDataFrame(
        [
            ("A", "F", 2.0, 100.0, 0.1),
            ("A", "O", 1.0, 50.0, 0.0),
            ("R", "F", 3.0, 10.0, 0.5),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    rows = {
        (r["return_flag"], r["line_status"]): r for r in revenue_rollup(li).collect()
    }
    assert rows[("A", "F")]["revenue"] == 90.0
    assert rows[("A", "ALL")]["n_items"] == 2
    assert rows[("A", "ALL")]["revenue"] == 140.0
    assert rows[("ALL", "ALL")]["n_items"] == 3
    assert rows[("ALL", "ALL")]["sum_qty"] == 6.0
    assert ("ALL", "F") not in rows  # rollup, not cube


def test_docs_cube_has_all_four_levels(spark):
    docs = spark.createDataFrame(
        [(1, "web", "en", 10), (2, "web", "de", 20), (3, "book", "en", 5)],
        "doc_id long, source string, lang string, n_chars long",
    )
    rows = {(r["source"], r["lang"]): r["n_docs"] for r in docs_cube(docs).collect()}
    assert rows[("web", "en")] == 1
    assert rows[("web", "ALL")] == 2
    assert rows[("ALL", "en")] == 2
    assert rows[("ALL", "ALL")] == 3


# ------------------------------------------------------------ adamic-adar

def test_adamic_adar_weights_rare_middles_higher(spark):
    # pair (1,2) shares middle 10 (deg 2); pair (3,4) shares middle 20
    # (deg 4) — same common count 1, but AA ranks the rare middle higher
    pairs = [(1, 10), (2, 10), (3, 20), (4, 20), (5, 20), (6, 20)]
    und = symmetrize(_edges(spark, pairs))
    out = adamic_adar_topk(und, k=3, max_middle_degree=None)
    sc = {(r["id"], r["candidate"]): r["score"] for r in out.collect()}
    assert sc[(1, 2)] == round(1 / math.log(2), 6)
    assert sc[(3, 4)] == round(1 / math.log(4), 6)
    assert sc[(1, 2)] > sc[(3, 4)]


def test_adamic_adar_excludes_existing_edges(spark):
    pairs = [(1, 2), (1, 3), (2, 3)]  # triangle: every pair adjacent
    und = symmetrize(_edges(spark, pairs))
    assert adamic_adar_topk(und, k=3, max_middle_degree=None).count() == 0


# ----------------------------------------------------------- char entropy

def test_char_entropy_known_values(spark):
    import math

    from pregel_golang_implementation_spark.operators.textstats import (
        char_entropy,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(docs).collect()}
    assert got[1] == 0.0  # single symbol: zero entropy
    assert got[2] == 1.0  # two symbols, uniform: 1 bit
    assert got[3] == 2.0  # four symbols, uniform: 2 bits
    assert 4 not in got  # empty doc excluded
    # a skewed distribution lands strictly between the uniform bounds
    docs2 = spark.createDataFrame([(9, "aab")], "doc_id long, text string")
    e = char_entropy(docs2).first()["entropy_bits"]
    expect = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(e - round(expect, 6)) < 1e-9
