"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; sign-random-projection
LSH bucketing as the scale path (candidates within a bucket only —
sub-quadratic).  Dot products use built-in higher-order functions
(zip_with + aggregate) — JVM codegen, no UDF (functions/__init__.py).

The LSH projection weights are derived from md5((bit,dim)) so the
identical deterministic "random" hyperplanes are reproducible in the
DuckDB oracle — no driver-side random state to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.functions import cosine_similarity


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim) — exact brute-force top-k for a small
    query set.  The query side is broadcast (tiny by construction); the
    corpus side streams — this is the shape that scales: never a corpus
    self-join."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    sim = cosine_similarity(F.col("_qv"), F.col("_cv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("_rn").alias("rank"))
    )


def srp_buckets(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — sign-random-projection LSH.

    weight(bit b, dim d) = -1 if first hex digit of md5('b_d') < '8'
    else +1; bucket bit b = [Σ_d w(b,d)·x_d ≥ 0].  Deterministic,
    engine-portable.  Bucket key is an int in [0, 2^bits).
    """
    dims = embeddings.select(
        F.col(id_col).alias("vec_id"), F.posexplode(F.col(vec_col)).alias("d", "x")
    )

    def wx(b: int):
        # weight(b, d) = ±1 from md5("b_d") — deterministic, engine-portable
        return F.col("x").cast("double") * F.when(
            F.substring(
                F.md5(F.concat(F.lit(f"{b}_"), F.col("d").cast("string"))), 1, 1
            ).isin(*list("01234567")),
            -1.0,
        ).otherwise(1.0)

    # the `bits` projections are SUM-aggregate columns over one pass of
    # the (vec, dim) rows — a bit explode would shuffle bits× the rows.
    # Round before the sign test: the projection sum is order-dependent in
    # the last ulps; rounding makes the bucket bit reproducible across
    # engines/partitionings.
    sums = dims.groupBy("vec_id").agg(
        *[F.round(F.sum(wx(b)), 6).alias(f"_s{b}") for b in range(bits)]
    )
    return sums.select(
        "vec_id",
        sum(
            F.when(F.col(f"_s{b}") >= 0, F.lit(float(2**b))).otherwise(F.lit(0.0))
            for b in range(bits)
        ).cast("long").alias("bucket"),
    )


def ann_candidates(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b) — candidate near-neighbor pairs sharing an SRP
    bucket.  Expected bucket occupancy n/2^bits keeps the in-bucket
    self-join sub-quadratic; verify candidates with exact cosine after.

    ``max_bucket_size`` caps bucket occupancy (identical/near-identical
    embedding clusters put k vectors in one bucket → k²/2 pairs from one
    reducer); buckets above the cap are skipped.  Use
    ``oversized_srp_buckets`` to report what was dropped — never silent."""
    bk = srp_buckets(embeddings, bits=bits, id_col=id_col, vec_col=vec_col)
    if max_bucket_size is not None:
        ok = (
            bk.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("bucket")
        )
        bk = bk.join(ok, "bucket", "left_semi")
    l = bk.select(F.col("bucket"), F.col("vec_id").alias("vec_a"))
    r = bk.select(F.col("bucket"), F.col("vec_id").alias("vec_b"))
    return (
        l.join(r, "bucket").filter(F.col("vec_a") < F.col("vec_b")).select("vec_a", "vec_b")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, sim) — embedding-cosine near-duplicates: SRP-LSH
    candidate pairs (sub-quadratic, optionally occupancy-capped) verified
    with exact cosine ≥ ``threshold``.  The candidates-then-verify shape
    of MinHash dedup, applied to the embedding column: the exact cosine
    runs only on in-bucket pairs, never corpus × corpus."""
    cand = ann_candidates(
        embeddings, bits=bits, id_col=id_col, vec_col=vec_col,
        max_bucket_size=max_bucket_size,
    )
    va = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"))
    vb = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"))
    sim = cosine_similarity(F.col("_va"), F.col("_vb"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def oversized_srp_buckets(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(bucket, n_vecs) — SRP buckets above the occupancy cap, i.e. what
    ``ann_candidates(max_bucket_size=...)`` skips."""
    bk = srp_buckets(embeddings, bits=bits, id_col=id_col, vec_col=vec_col)
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .filter(F.col("n_vecs") > max_bucket_size)
    )


def ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's SRP
    bucket (the IVF-style scale path; recall < 1.0 by design)."""
    bk = srp_buckets(embeddings, bits=bits, id_col=id_col, vec_col=vec_col)
    emb = embeddings.join(
        bk.withColumnRenamed("vec_id", "_bk_id"),
        F.col(id_col) == F.col("_bk_id"),
    ).drop("_bk_id")
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), F.col("bucket")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), F.col("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("_rn").alias("rank"))
    )
