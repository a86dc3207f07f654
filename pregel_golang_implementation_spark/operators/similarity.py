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

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.functions import cosine_similarity


def _distributed_topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-level distributed top-k over (query_id, neighbor_id, sim).

    Returns (query_id, neighbor_id, sim, rank) with rank = 1..k ordered by
    (sim desc, neighbor_id asc) — the same result as a row_number window,
    WITHOUT the window's scale-killer: ``Window.partitionBy(query_id)``
    funnels every scored row for a query onto ONE reducer (with a handful
    of queries against a 100 TB corpus, that is a single-task sort of
    ~|corpus| rows per query).  Here instead:

      1. partial top-k per (query_id, input-partition): groups are
         map-local, the composite key fans the aggregation out across ALL
         reducers, and each group sorts only one partition's rows;
      2. final merge of the ≤ num_partitions × k survivors per query — a
         tiny second aggregate (k rows per upstream partition).

    The sort key is the struct (-sim, neighbor_id) ascending, which
    reproduces the window's (sim desc, neighbor_id asc) ordering exactly
    for finite sims; NaN sims sort LAST here (Spark orders NaN greatest,
    so the old desc window put them first) — a NaN score can no longer
    displace real neighbors, which is the ordering a user wants anyway.

    NULL sims (cosine of a zero-norm vector: Spark division by zero is
    NULL) are dropped before ranking: a NULL ``-sim`` struct field would
    sort FIRST in ``sort_array`` ascending and a degenerate embedding
    would occupy ranks 1..k ahead of every real neighbor.  "No similarity
    defined" is not "most similar" — filter, don't rank.
    """
    scored = scored.filter(F.col("sim").isNotNull())
    item = F.struct(
        (-F.col("sim")).alias("_neg"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col("sim").alias("sim"),
    )
    partial = (
        scored.withColumn("_p", F.spark_partition_id())
        .groupBy("query_id", "_p")
        .agg(F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("_tk"))
    )
    merged = partial.groupBy("query_id").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("_tk"))), 1, k).alias("_tk")
    )
    return merged.select("query_id", F.posexplode("_tk").alias("_r", "_s")).select(
        "query_id",
        F.col("_s.neighbor_id").alias("neighbor_id"),
        F.col("_s.sim").alias("sim"),
        (F.col("_r") + 1).alias("rank"),
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact brute-force top-k for a
    small query set.  The query side is broadcast (tiny by construction);
    the corpus side streams — this is the shape that scales: never a
    corpus self-join.  Top-k selection is the two-level partial top-k
    (``_distributed_topk``), never a per-query single-reducer window."""
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
    return _distributed_topk(scored, k)


def _srp_weights(bits: int, dims: int) -> list[list[float]]:
    """The ±1 hyperplane table, derived ONCE on the driver: weight(b, d) =
    -1 if the first hex digit of md5('b_d') < '8' else +1 — the identical
    spec the DuckDB oracle evaluates in SQL.  bits×dims md5 calls total,
    instead of bits×dims md5 calls PER VECTOR (the r2 shape recomputed
    these constants inside the row expression)."""
    return [
        [
            -1.0
            if hashlib.md5(f"{b}_{d}".encode()).hexdigest()[0] in "01234567"
            else 1.0
            for d in range(dims)
        ]
        for b in range(bits)
    ]


def srp_buckets(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """(vec_id, bucket) — sign-random-projection LSH.

    weight(bit b, dim d) = -1 if first hex digit of md5('b_d') < '8'
    else +1; bucket bit b = [Σ_d w(b,d)·x_d ≥ 0].  Deterministic,
    engine-portable.  Bucket key is an int in [0, 2^bits).

    The weight table is precomputed on the driver (``_srp_weights``) and
    shipped as array literals; each projection is a zip_with + ordered
    aggregate over the vector — a pure codegen PROJECTION, no explode and
    no shuffle at all (the r2 shape exploded to (vec, dim) rows and
    re-aggregated: a corpus-sized shuffle of dims× the rows, plus per-row
    md5 of constants).  The ordered fold sums dims in index order, exactly
    the order the old per-vector F.sum accumulated, so rounded projections
    are bit-identical.

    ``dims`` must cover every vector's length (inferred from the first row
    when None — assumes the uniform-dimension embedding tables this module
    targets); dims present in a vector beyond ``dims`` are ignored, and
    vectors shorter than ``dims`` contribute nothing for missing entries
    (same as the exploded formulation).
    """
    if dims is None:
        row = embeddings.select(F.size(F.col(vec_col)).alias("n")).head(1)
        dims = int(row[0]["n"]) if row else 0
    weights = _srp_weights(bits, dims)
    v = F.col(vec_col)

    def proj(b: int):
        wb = F.array(*[F.lit(w) for w in weights[b]])
        # round before the sign test: makes the bucket bit reproducible
        # across engines regardless of last-ulp sum-order effects
        return F.round(
            F.aggregate(
                F.zip_with(
                    v, wb, lambda x, w: F.coalesce(x.cast("double") * w, F.lit(0.0))
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            6,
        )

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        sum(
            F.when(proj(b) >= 0, F.lit(float(2**b))).otherwise(F.lit(0.0))
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
    # pinned: the bucket frame feeds the self-join twice (plus the
    # occupancy filter when capped); without the pin each copy re-scans
    # the embeddings and recomputes every projection (r6 — no exchange
    # reuse fires in this Spark build)
    bk = srp_buckets(embeddings, bits=bits, id_col=id_col, vec_col=vec_col)
    bk = bk.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        ok = (
            bk.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("bucket")
        )
        bk = bk.join(ok, "bucket", "left_semi").localCheckpoint(eager=False)
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


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """(vec_id, neighbor_id, sim, rank) — approximate kNN GRAPH over the
    whole corpus: every vector is a query; its candidates are its SRP
    bucket mates (exact cosine inside the bucket, recall < 1 by design).
    The standard input to embedding-based clustering/dedup pipelines.

    Scale shape: the bucket equi-join replaces the corpus² cross product
    with Σ_b n_b² work (expected n/2^bits per bucket); per-vector top-k
    is the two-level ``_distributed_topk`` — no per-vector window, no
    single-reducer sort anywhere.  ``max_bucket_size`` skips
    over-occupied buckets (identical-embedding clusters); report the
    dropped set with ``oversized_srp_buckets`` — never silent."""
    # pinned for the same two-consumer reason as ann_candidates (r6)
    bk = srp_buckets(embeddings, bits=bits, id_col=id_col, vec_col=vec_col)
    bk = bk.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        ok = (
            bk.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("bucket")
        )
        bk = bk.join(ok, "bucket", "left_semi").localCheckpoint(eager=False)
    emb = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    a = emb.join(bk, F.col("_id") == F.col("vec_id")).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), "bucket"
    )
    b = emb.join(bk, F.col("_id") == F.col("vec_id")).select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("_cv"), "bucket"
    )
    sim = cosine_similarity(F.col("_qv"), F.col("_cv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    return (
        _distributed_topk(scored, k)
        .withColumnRenamed("query_id", "vec_id")
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
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's SRP
    bucket (the IVF-style scale path; recall < 1.0 by design).  Top-k
    selection via ``_distributed_topk`` — the in-bucket candidate set per
    query is already 2^bits× smaller than the corpus, but a handful of
    queries over a 100 TB corpus still must not sort on one reducer."""
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
    sim = cosine_similarity(F.col("_qv"), F.col("_cv"))
    if round_to is not None:
        # round BEFORE ranking so rank ties are engine-reproducible
        sim = F.round(sim, round_to)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    return _distributed_topk(scored, k)


# ------------------------------------------------------------------- IVF

def ivf_centroids(
    embeddings: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid_id, cvec) — a deterministic coarse quantizer: the
    ``num_centroids`` corpus vectors with the smallest md5(id) (ties by
    id).  The md5 order is a reproducible pseudo-random sample — the same
    engine-portable trick as ``sampling.hash_sample`` — so the DuckDB
    oracle derives the identical codebook in SQL; a real deployment would
    swap in k-means centroids without touching anything downstream.
    Scale shape: TakeOrderedAndProject (per-partition top-C, tiny merge),
    never a global sort."""
    return (
        embeddings.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("cvec"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "centroid_id")
        .limit(num_centroids)
        .drop("_h")
    )


def _ivf_cell_exprs(centroids: list[tuple[int, list[float]]], vec_col: str):
    """Array-of-struct expression [(‑sim6, centroid_id), …] for one
    vector column against driver-side centroid literals: argmin of the
    sorted array = highest similarity, ties to the smallest centroid id.
    Pure codegen projection — the centroid table rides the plan as
    literals exactly like the SRP hyperplanes (zero Exchange, no UDF)."""
    items = []
    for cid, cvec in centroids:
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        # zero-norm vectors have NULL cosine; coalesce to -2.0 (below any
        # real cosine) so they sort last DETERMINISTICALLY in both engines
        # (Spark ranks struct NULLs first, DuckDB NULLS LAST on DESC —
        # without the sentinel the two argmaxes disagree)
        sim6 = F.coalesce(
            F.round(cosine_similarity(F.col(vec_col), lit), 6), F.lit(-2.0)
        )
        items.append(
            F.struct(
                (-sim6).alias("_neg"), F.lit(int(cid)).cast("long").alias("cid")
            )
        )
    return F.sort_array(F.array(*items))


def ivf_assign(
    embeddings: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell) — nearest-centroid (cosine) cell per vector, the
    IVF inverted-list assignment.  Similarities are rounded to 6dp BEFORE
    the argmax so the winning cell is engine-reproducible (the SRP
    round-before-sign convention); zero-norm vectors (NULL cosine) fall
    to the -2.0 sentinel and land in the lowest-id centroid's cell in
    both engines.  One pass over the corpus, no shuffle:
    the codebook is collected to the driver (it is tiny by construction —
    C ≤ a few hundred even at 100 TB corpus scale) and inlined."""
    cent = [
        (r["centroid_id"], list(r["cvec"]))
        for r in ivf_centroids(
            embeddings, num_centroids, id_col=id_col, vec_col=vec_col
        ).collect()
    ]
    cells = _ivf_cell_exprs(cent, vec_col)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        cells[0]["cid"].alias("cell"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — IVF approximate top-k: exact
    cosine only against vectors whose cell is one of the query's
    ``nprobe`` nearest centroids (recall < 1 by design; the centroid-
    codebook counterpart of the SRP-bucket ``ann_topk``).

    Scale shape: cell assignment is a shuffle-free projection over the
    corpus (driver-inlined codebook, see ``ivf_assign``); the probe list
    (|queries| × nprobe rows) is broadcast into one join on ``cell``; the
    only wide exchange in the whole plan is the two-level partial top-k.
    Candidate volume per query ≈ nprobe/C of the corpus."""
    cent = [
        (r["centroid_id"], list(r["cvec"]))
        for r in ivf_centroids(
            embeddings, num_centroids, id_col=id_col, vec_col=vec_col
        ).collect()
    ]
    cells = _ivf_cell_exprs(cent, vec_col)
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        cells[0]["cid"].alias("cell"),
    )
    probes = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(
                F.slice(F.transform(cells, lambda s: s["cid"]), 1, nprobe)
            ).alias("cell"),
        )
    )
    sim = cosine_similarity(F.col("_qv"), F.col("_cv"))
    if round_to is not None:
        # round BEFORE ranking so rank ties are engine-reproducible
        sim = F.round(sim, round_to)
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    return _distributed_topk(scored, k)
