"""Sequence packing: distributed prefix sum vs a single-process oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.packing import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens long")


def _expected(rows, capacity):
    ordered = sorted(
        (r for r in rows if r[1] > 0),
        key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
    )
    out, acc = {}, 0
    for doc_id, tokens in ordered:
        out[doc_id] = (acc, acc // capacity, (acc + tokens - 1) // capacity)
        acc += tokens
    return out


@pytest.mark.parametrize("capacity", [10, 100])
def test_pack_matches_sequential_oracle(spark, capacity):
    rows = [(i, (i * 37) % 23 + 1) for i in range(50)]
    got = {
        r["doc_id"]: (r["start_token"], r["first_seq"], r["last_seq"])
        for r in pack_sequences(_df(spark, rows), capacity, num_ranges=8).collect()
    }
    assert got == _expected(rows, capacity)


def test_pack_straddles_and_counts_sequences(spark):
    # one 25-token doc at capacity 10 must span 3 sequences
    rows = [(1, 25)]
    r = pack_sequences(_df(spark, rows), 10).collect()[0]
    assert (r["start_token"], r["first_seq"], r["last_seq"], r["n_seqs"]) == (
        0,
        0,
        2,
        3,
    )


def test_pack_excludes_zero_token_docs(spark):
    rows = [(1, 0), (2, 5)]
    out = pack_sequences(_df(spark, rows), 10).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_pack_rejects_bad_capacity(spark):
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(_df(spark, [(1, 5)]), 0)


def test_pack_total_tokens_consistent(spark):
    rows = [(i, i + 1) for i in range(30)]
    out = pack_sequences(_df(spark, rows), 7, num_ranges=4)
    total = sum(t for _, t in rows)
    # max(start_token + tokens) over the packing == total stream length
    joined = out.join(_df(spark, rows), "doc_id")
    end_max = joined.agg(
        F.max(F.col("start_token") + F.col("tokens")).alias("m")
    ).first()["m"]
    assert end_max == total
