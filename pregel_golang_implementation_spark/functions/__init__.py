"""Shared column-expression helpers (JVM-side, codegen-friendly)."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 64-bit hash (xxhash64 — JVM-side)."""
    return F.xxhash64(col, F.lit(seed))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns using built-in
    higher-order functions — stays inside codegen, no UDF.

    A zero-norm vector has no defined cosine: ``try_divide`` yields NULL
    for it (under ANSI mode — Spark 4's default — a plain ``/`` would
    hard-fail the whole job with DIVIDE_BY_ZERO the first time a
    degenerate embedding appears in a 100 TB corpus).  Rankers drop NULL
    sims before ordering (similarity._distributed_topk)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.try_divide(dot, na * nb)
