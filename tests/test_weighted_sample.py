"""Weighted sampling without replacement (exponential race)."""

from __future__ import annotations

import pytest

from pregel_golang_implementation_spark.operators.sampling import (
    weighted_sample_topk,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_weight_bias_heavy_rows_oversampled(spark):
    # 50 heavy rows (w=1000) among 950 light ones (w=1): a 50-row sample
    # must be dominated by heavy rows (uniform sampling would pick ~2.5)
    rows = [(i, 1000 if i < 50 else 1) for i in range(1000)]
    got = weighted_sample_topk(_df(spark, rows), 50, "n_chars").collect()
    heavy = sum(1 for r in got if r["doc_id"] < 50)
    assert heavy > 35


def test_deterministic_across_runs_and_partitioning(spark):
    rows = [(i, (i % 7) + 1) for i in range(200)]
    a = weighted_sample_topk(_df(spark, rows), 20, "n_chars").collect()
    b = weighted_sample_topk(
        _df(spark, rows).repartition(13), 20, "n_chars"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_zero_weight_rows_excluded_and_bad_k_raises(spark):
    rows = [(1, 0), (2, 5), (3, 5)]
    got = weighted_sample_topk(_df(spark, rows), 10, "n_chars").collect()
    assert sorted(r["doc_id"] for r in got) == [2, 3]
    with pytest.raises(ValueError, match="k must"):
        weighted_sample_topk(_df(spark, rows), 0, "n_chars")
