"""HyperLogLog: estimate accuracy, duplicate-invariance, monoid merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.sketches import (
    hll_distinct,
    hll_registers,
)


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_hll_estimate_within_stderr_band(spark):
    # 5000 distinct values; m=256 → stderr ≈ 6.5%, assert within 4σ
    df = _vals(spark, [f"value-{i}" for i in range(5000)])
    est = hll_distinct(df, "v").first()["estimate"]
    assert abs(est - 5000) / 5000 < 0.26


def test_hll_ignores_duplicates(spark):
    base = [f"tok-{i}" for i in range(800)]
    once = hll_distinct(_vals(spark, base), "v").first()["estimate"]
    thrice = hll_distinct(_vals(spark, base * 3), "v").first()["estimate"]
    assert once == thrice


def test_hll_small_range_linear_counting(spark):
    # 10 values: raw estimate is tiny, must take the linear-counting
    # branch and land very close (exact while registers are sparse)
    df = _vals(spark, [f"x{i}" for i in range(10)])
    row = hll_distinct(df, "v").first()
    assert row["registers_used"] <= 10
    assert abs(row["estimate"] - 10) < 1.0


def test_hll_registers_merge_as_elementwise_max(spark):
    # sketch(A ∪ B) == elementwise-max(sketch(A), sketch(B)) — the
    # monoid property a shard-wise rollup relies on
    a = [f"a-{i}" for i in range(300)]
    b = [f"b-{i}" for i in range(300)]
    ra = hll_registers(_vals(spark, a), "v")
    rb = hll_registers(_vals(spark, b), "v")
    merged = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    direct = hll_registers(_vals(spark, a + b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_merge_estimate_equals_direct(spark):
    from pregel_golang_implementation_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
    )

    a = _vals(spark, [f"p-{i}" for i in range(400)])
    b = _vals(spark, [f"q-{i}" for i in range(400)])
    merged_est = hll_estimate_from_registers(
        hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    ).first()
    direct_est = hll_distinct(
        _vals(spark, [f"p-{i}" for i in range(400)] + [f"q-{i}" for i in range(400)]),
        "v",
    ).first()
    assert tuple(merged_est) == tuple(direct_est)
