"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator (SURVEY.md §2) over the
driver's parquet tables; ``oracle_sql()`` holds the DuckDB twin.  The
iterative graph queries (PageRank / CC / SSSP / LPA) run the REAL BSP
superstep runner for a fixed number of supersteps, and their oracles are
the same recurrence unrolled as chained SQL CTEs — supersteps are plain
join+group-by SQL (SURVEY.md §5.3).

Graph derivation (shared Spark/SQL): the bipartite order↔part graph from
lineitem — src=l_orderkey, dst=10_000_000+l_partkey,
weight=min(l_linenumber) — plus its symmetrized undirected form.

Floats are rounded identically on both sides (rank→6dp, cosine→5dp) so
the driver's order-insensitive value-hash is stable under FP-sum
reordering; integer-valued results are exact.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.connected_components import (
    cc_spec,
    symmetrize,
)
from pregel_golang_implementation_spark.operators.dedup import (
    exact_duplicates,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_clusters,
    ngram_containment,
    ngram_jaccard,
    simhash,
    simhash_near_dups,
    word_shingles,
)
from pregel_golang_implementation_spark.operators.events import (
    event_window_stats,
    sessionize,
)
from pregel_golang_implementation_spark.operators.label_propagation import (
    lpa_spec,
    seeded_label_spread,
)
from pregel_golang_implementation_spark.operators.pagerank import (
    incremental_pagerank,
    pagerank_spec,
    prepare_pagerank_graph,
)
from pregel_golang_implementation_spark.operators.kcore import kcore_peel
from pregel_golang_implementation_spark.operators.ktruss import ktruss_peel
from pregel_golang_implementation_spark.operators.similarity import (
    ann_candidates,
    ann_topk,
    cosine_topk,
    embedding_near_dups,
    ivf_topk,
    knn_graph,
    srp_buckets,
)
from pregel_golang_implementation_spark.operators.events import funnel, last_touch
from pregel_golang_implementation_spark.operators.graph_metrics import (
    degree_assortativity,
    partition_quality,
    powerlaw_alpha,
    square_count,
)
from pregel_golang_implementation_spark.operators.hits import hits
from pregel_golang_implementation_spark.operators.link_prediction import (
    adamic_adar_topk,
    common_neighbor_topk,
)
from pregel_golang_implementation_spark.operators.kmeans import kmeans_assign
from pregel_golang_implementation_spark.operators.relational import (
    docs_cube,
    revenue_rollup,
)
from pregel_golang_implementation_spark.operators.scc import scc_fwbw
from pregel_golang_implementation_spark.operators.bfs import (
    harmonic_centrality,
    msbfs_distances,
)
from pregel_golang_implementation_spark.operators.projection import (
    cooccurrence_topk,
)
from pregel_golang_implementation_spark.operators.packing import pack_sequences
from pregel_golang_implementation_spark.operators.betweenness import (
    betweenness_sampled,
)
from pregel_golang_implementation_spark.operators.sketches import hll_distinct
from pregel_golang_implementation_spark.operators.mis import mis_spec, mis_status
from pregel_golang_implementation_spark.operators.quantization import pq_codes
from pregel_golang_implementation_spark.operators.sampling import (
    hash_sample,
    mix_corpus,
    stratified_sample,
    weighted_sample_topk,
)
from pregel_golang_implementation_spark.operators.terms import (
    bm25_topk,
    normalize_text,
    repeated_spans,
    tfidf_top_terms,
    top_ngrams,
)
from pregel_golang_implementation_spark.operators.sssp import sssp_spec
from pregel_golang_implementation_spark.operators.textstats import (
    char_entropy,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from pregel_golang_implementation_spark.operators.triangles import _triangle_rows
from pregel_golang_implementation_spark.plans.runner import PregelRunner
from pregel_golang_implementation_spark.operators.coloring import greedy_coloring
from pregel_golang_implementation_spark.operators.quantiles import exact_quantiles
from pregel_golang_implementation_spark.operators.temporal import earliest_arrival_spec
from pregel_golang_implementation_spark.operators.walks import random_walks
from pregel_golang_implementation_spark.sources.graphs import (
    edges_from_lineitem,
    parity_edges_from_lineitem,
    temporal_edges_from_lineitem,
)

PART_OFFSET = 10_000_000
PR_ITERS = 5
CC_ITERS = 6
SSSP_ITERS = 4
LPA_ITERS = 2
LPA4_ITERS = 4
KNN_QUERY_IDS = [0, 1, 2, 3, 4]
KNN_K = 5
RESOLVE_ITERS = 6
RESOLVE_THRESHOLD = 0.5
KCORE_K = 5
KCORE_ROUNDS = 3
IVF_CENTROIDS = 8
IVF_NPROBE = 2
TFIDF_K = 3
TOP_NGRAMS_K = 20
STRAT_FRACTIONS = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
STRAT_DEFAULT = 0.1
FUNNEL_STEPS = ("view", "click", "purchase")
PQ_M = 4
PQ_KSUB = 4
EMB_DIM = 64
MIS_ITERS = 4
MIS_OUT = float(2**48)
LP_K = 3
LP_MAX_MID_DEG = 40
SPAN_N = 6
SPAN_MIN_DOCS = 2
HITS_ITERS = 3
COLOR_ROUNDS = 3
COLOR_INNER = 3
QUANTILE_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
WALK_LEN = 3
TEMPORAL_ITERS = 4
SCC_INNER = 14
SCC_TRIM = 2
KMEANS_K = 8
KMEANS_ITERS = 2
HARMONIC_PIVOTS = 4
HARMONIC_HOPS = 4
COPURCHASE_MAX_BASKET = 40
PACK_CAPACITY = 2048
QUALITY_CUT_Q = 0.9
BETWEEN_PIVOTS = 2
BETWEEN_HOPS = 4
WSAMPLE_K = 50
SPREAD_ROUNDS = 4
BM25_TERMS = ("spark", "window", "merge")
BM25_K = 10
KTRUSS_K = 3
KTRUSS_ROUNDS = 3
PL_DMIN = 2
INC_PR_PRIOR_ITERS = 3
INC_PR_ITERS = 3
PQUAL_PARTS = 8
BM25_K1 = 1.2
BM25_B = 0.75


# --------------------------------------------------------------- helpers

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _runner(spark: SparkSession, spec) -> PregelRunner:
    # steps_per_action=2: chained supersteps (one job per block) — exact
    # for fixed-iteration runs, including globals-bearing PageRank since
    # r4 (in-plan dangling mass); running the correctness gate chained
    # keeps the production fast path itself under the oracle hash check
    return PregelRunner(spark, spec, lineage_break_every=3, steps_per_action=2)


def _sssp_source(spark: SparkSession, sf_dir: str) -> int:
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .agg(F.min("l_orderkey"))
        .first()[0]
    )


# ---------------------------------------------------------- spark queries

def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = edges_from_lineitem(spark, sf_dir)
    pr_edges, vertices = prepare_pagerank_graph(edges)
    n = vertices.count()
    res = _runner(spark, pagerank_spec(n, damping=0.85, tol=1e-12)).run(
        pr_edges, vertices=vertices, max_supersteps=PR_ITERS
    )
    return res.state.select(
        "id", F.round(F.col("value"), 6).alias("rank")
    )


def q_pagerank_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-salted PageRank under the driver gate (SURVEY.md §4 P7, the
    10^12-scale skew lever): same 5 fixed supersteps as ``pagerank_5iter``
    but with ``salt_degree_threshold=10`` — at sf0.01 every part-side
    vertex (in-degree ≈ 30) splits its inbox across 4 salt replicas, so
    the salted combine + recombine_sum merge path is what the oracle
    hash actually checks.  The oracle is the UNSALTED recurrence:
    salting must be a pure execution strategy, invisible in the result."""
    edges = edges_from_lineitem(spark, sf_dir)
    pr_edges, vertices = prepare_pagerank_graph(edges)
    n = vertices.count()
    runner = PregelRunner(
        spark,
        pagerank_spec(n, damping=0.85, tol=1e-12),
        lineage_break_every=3,
        steps_per_action=2,
        salt_degree_threshold=10,
        num_salts=4,
    )
    res = runner.run(pr_edges, vertices=vertices, max_supersteps=PR_ITERS)
    return res.state.select("id", F.round(F.col("value"), 6).alias("rank"))


def q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    res = _runner(spark, cc_spec()).run(und, max_supersteps=CC_ITERS)
    return res.state.select("id", F.col("value").cast("long").alias("component"))


def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size distribution — the aggregate a link-graph user
    reads first; composes the BSP result with a plain groupBy."""
    return (
        q_cc(spark, sf_dir)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-degree histogram over the directed edge table: (degree,
    n_vertices).  Two partial-aggregated shuffles, output is tiny."""
    return (
        q_degrees(spark, sf_dir)
        .select((F.col("out_deg") + F.col("in_deg")).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = symmetrize_weighted(edges_from_lineitem(spark, sf_dir))
    src = _sssp_source(spark, sf_dir)
    res = _runner(spark, sssp_spec(source=src)).run(edges, max_supersteps=SSSP_ITERS)
    return res.state.filter(~F.isnan("value") & (F.col("value") < 1e17)).select(
        "id", F.col("value").alias("distance")
    )


def symmetrize_weighted(edges: DataFrame) -> DataFrame:
    """Undirected weighted view: both directions, min weight per pair."""
    back = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
    )
    return (
        edges.union(back)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )


INC_CC_PRIOR_ITERS = 6
INC_CC_ITERS = 4


def q_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CC: label the even-part subgraph first, then maintain
    as the odd-part edges 'arrive' — seeded hash-min over the full graph
    (operators/connected_components.incremental_connected_components)."""
    from pregel_golang_implementation_spark.operators.connected_components import (
        incremental_connected_components,
    )

    edges = edges_from_lineitem(spark, sf_dir)
    subset = edges.filter(F.col("dst") % 2 == 0)
    prior = _runner(spark, cc_spec()).run(
        symmetrize(subset), max_supersteps=INC_CC_PRIOR_ITERS
    )
    res = incremental_connected_components(
        spark,
        edges,
        prior.state.select("id", "value"),
        max_supersteps=INC_CC_ITERS,
        lineage_break_every=3,
    )
    return res.state.select("id", F.col("value").cast("long").alias("component"))


def q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    res = _runner(spark, lpa_spec()).run(und, max_supersteps=LPA_ITERS)
    return res.state.select("id", F.col("value").cast("long").alias("label"))


def q_lpa4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPA deeper than the 2-step row: 4 synchronous supersteps, where
    the interesting dynamics (labels flowing back, oscillation pressure,
    repeated tie-breaks — SURVEY.md §7 hard part (b)) actually appear.
    Oracle: the same mode+smallest-label recurrence unrolled 4×."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    res = _runner(spark, lpa_spec()).run(und, max_supersteps=LPA4_ITERS)
    return res.state.select("id", F.col("value").cast("long").alias("label"))


def q_scatter_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One superstep's scatter+combine in isolation (operators O5+O6+O7):
    init value=id, msg=value+weight, min-combine."""
    edges = edges_from_lineitem(spark, sf_dir)
    msgs = edges.select(
        F.col("dst").alias("id"), (F.col("src") + F.col("weight")).alias("m")
    )
    return msgs.groupBy("id").agg(
        F.min("m").alias("msg"), F.count(F.lit(1)).cast("long").alias("n_msgs")
    )


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = edges_from_lineitem(spark, sf_dir)
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def q_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vote-to-halt surface (O9): vertices still ACTIVE after 2 CC
    supersteps — i.e. whose component label improved in superstep 2."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    res = _runner(spark, cc_spec()).run(und, max_supersteps=2)
    return res.state.filter("active").select("id")


def q_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15/O19 end-to-end under the driver's hash gate: run CC for 2
    supersteps with a durable parquet+manifest checkpoint, then RESUME
    from the committed snapshot in a FRESH runner for 4 more — the final
    state must be indistinguishable from an uninterrupted 6-step run
    (oracle: the same unrolled 6-iteration CTE chain as ``cc_6iter``).
    Reference semantics being proven: restart from the last completed
    superstep's values, re-scatter free (Worker.go:641-654; checkpoint
    snapshot Master.go:789-808; commit marker Master.go:969-1012)."""
    import shutil
    import tempfile

    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    ckpt = tempfile.mkdtemp(prefix="pregel_ckpt_contract_")
    try:
        first = PregelRunner(
            spark, cc_spec(), lineage_break_every=3, steps_per_action=2,
            checkpoint_dir=ckpt, checkpoint_every=2,
        )
        first.run(und, max_supersteps=2)
        resumed = PregelRunner(
            spark, cc_spec(), lineage_break_every=3, steps_per_action=2,
            checkpoint_dir=ckpt,
        )
        res = resumed.resume(und, max_supersteps=CC_ITERS - 2)
        # result state is eagerly localCheckpoint-ed by the runner, so it
        # no longer depends on the snapshot files deleted below
        return res.state.select(
            "id", F.col("value").cast("long").alias("component")
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part–part co-purchase graph: parts appearing in ≥2 common orders."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
    )


def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle participation (every triangle credits all
    three corners) — degree-ordered enumeration, orientation-independent
    counts; oracle enumerates under the plain src<dst orientation."""
    from pregel_golang_implementation_spark.operators.triangles import (
        triangles_per_vertex,
    )

    e = _copurchase_edges(spark, sf_dir)
    return triangles_per_vertex(spark, e).select(
        "id", F.col("triangles").cast("long").alias("triangles")
    )


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # degree_order=True (r4 default): identical count, but wedge
    # enumeration fans out from low-degree endpoints — the orientation
    # that survives a hub-skewed graph at 100×
    e = _copurchase_edges(spark, sf_dir)
    tri = _triangle_rows(e, degree_order=True)
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf_dir)).select(
        "content_hash",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = word_shingles(_docs(spark, sf_dir), n=3)
    return minhash_signatures(sh, num_hashes=16, hash_fn="md5").select(
        "doc_id", F.col("seed").cast("long").alias("seed"), "minhash"
    )


def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = word_shingles(_docs(spark, sf_dir), n=3)
    sig = minhash_signatures(sh, num_hashes=16, hash_fn="md5")
    return lsh_candidate_pairs(lsh_bands(sig, rows_per_band=4))


def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ngram_jaccard(_docs(spark, sf_dir), shingle_n=3, threshold=0.05)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir), bits=16)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming near-dup pairs — banded candidates (pigeonhole:
    max_hamming+1 bands → perfect recall), bit_count(XOR) verify.  The
    oracle is the brute-force n² Hamming join: identical answers prove
    the banding prunes work without losing pairs."""
    out = simhash_near_dups(_docs(spark, sf_dir), bits=16, max_hamming=3)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_docs(spark, sf_dir))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir))


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = cosine_topk(_emb(spark, sf_dir), KNN_QUERY_IDS, k=KNN_K, round_to=5)
    return out.select(
        "query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


def q_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return srp_buckets(_emb(spark, sf_dir), bits=8)


def q_jaccard_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidates-then-verify — the pair predicate sits BELOW the
    shingle self-join (the scale path; all-pairs never materializes)."""
    docs = _docs(spark, sf_dir)
    sh = word_shingles(docs, n=3)
    sig = minhash_signatures(sh, num_hashes=16, hash_fn="md5")
    pairs = lsh_candidate_pairs(lsh_bands(sig, rows_per_band=4))
    out = ngram_jaccard(docs, pairs=pairs, shingle_n=3)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: exact collapse → LSH candidates →
    Jaccard verify → CC over the duplicate graph → canonical per cluster."""
    out = near_dup_clusters(
        _docs(spark, sf_dir),
        threshold=RESOLVE_THRESHOLD,
        max_supersteps=RESOLVE_ITERS,
    )
    return out.select(
        "doc_id",
        "cluster_id",
        F.col("is_canonical").cast("long").alias("is_canonical"),
    )


def q_ann_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_candidates(_emb(spark, sf_dir), bits=8)


ANN_BITS = 6


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: exact cosine within the query's SRP
    bucket only (recall < 1 by design; the 2^bits-smaller scale path)."""
    out = ann_topk(_emb(spark, sf_dir), KNN_QUERY_IDS, k=KNN_K, bits=ANN_BITS, round_to=5)
    return out.select(
        "query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (teleport to the min-orderkey vertex),
    PR_ITERS supersteps."""
    from pregel_golang_implementation_spark.operators.pagerank import (
        personalized_pagerank_spec,
    )

    edges = edges_from_lineitem(spark, sf_dir)
    pr_edges, vertices = prepare_pagerank_graph(edges)
    src = _sssp_source(spark, sf_dir)
    vertices = vertices.withColumn(
        "p", F.when(F.col("id") == src, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    res = _runner(spark, personalized_pagerank_spec(damping=0.85, tol=1e-12)).run(
        pr_edges, vertices=vertices, max_supersteps=PR_ITERS
    )
    return res.state.select("id", F.round(F.col("value"), 6).alias("rank"))


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank: rank flows proportionally to edge weight
    (min(l_linenumber) per edge) instead of uniformly over out-edges."""
    edges = edges_from_lineitem(spark, sf_dir)
    pr_edges, vertices = prepare_pagerank_graph(edges, weighted=True)
    n = vertices.count()
    res = _runner(spark, pagerank_spec(n, damping=0.85, tol=1e-12)).run(
        pr_edges, vertices=vertices, max_supersteps=PR_ITERS
    )
    return res.state.select("id", F.round(F.col("value"), 6).alias("rank"))


def q_pagerank_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k report surface (SURVEY.md §2.2 sorts/limits): highest-rank
    vertices after PR_ITERS supersteps, deterministic tie-break by id."""
    return (
        q_pagerank(spark, sf_dir)
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(10)
    )


SAMPLE_FRACTION = 0.25
MIX_MULTIPLIERS = {"src0": 2.25, "src1": 0.4, "src2": 0.0}


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (reproducible train-set selection)."""
    return hash_sample(_docs(spark, sf_dir), SAMPLE_FRACTION).select(
        "doc_id", "lang", "source"
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain reweighting: per-source replicate/downsample multipliers."""
    out = mix_corpus(_docs(spark, sf_dir), MIX_MULTIPLIERS, on_col="source")
    return out.select(
        "doc_id", "source", F.col("copy_no").cast("long").alias("copy_no")
    )


def q_event_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window event stats + JSON-prop extraction."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_window_stats(events, window="1 hour")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity boundary)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(events, gap_minutes=30).select(
        "user_id",
        F.col("session_no").cast("long").alias("session_no"),
        "n_events",
        "start_ts",
        "end_ts",
        "total_value",
    )


DECONTAM_BENCH_MAX_ID = 10  # doc_id < 10 plays the "benchmark suite"


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: asymmetric n-gram containment of each
    'benchmark' doc (doc_id < 10) against the rest of the corpus."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < DECONTAM_BENCH_MAX_ID)
    corpus = docs.filter(F.col("doc_id") >= DECONTAM_BENCH_MAX_ID)
    out = ngram_containment(corpus, bench, n=3)
    return out.select(
        "doc_id", "benchmark_id", F.round("containment", 6).alias("containment")
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: SRP candidates verified with exact
    cosine ≥ threshold (never corpus × corpus)."""
    return embedding_near_dups(
        _emb(spark, sf_dir), threshold=0.2, bits=8, round_to=5
    )


KNN_GRAPH_K = 3


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN graph: per-vector top-k among SRP bucket mates."""
    out = knn_graph(_emb(spark, sf_dir), k=KNN_GRAPH_K, bits=ANN_BITS, round_to=5)
    return out.select(
        "vec_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling over the undirected order↔part graph: vertices
    still alive after KCORE_ROUNDS rounds of remove-degree-<-k, with the
    induced degree that justified survival (operators/kcore.py — the
    relational form of the classic Pregel peel, Vertex.go:68-88 shape)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    return kcore_peel(und, k=KCORE_K, rounds=KCORE_ROUNDS)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: deterministic md5-sampled centroid codebook,
    shuffle-free cell assignment (driver-inlined codebook literals, the
    SRP-hyperplane trick), nprobe-cell candidates, exact cosine re-rank."""
    out = ivf_topk(
        _emb(spark, sf_dir),
        KNN_QUERY_IDS,
        k=KNN_K,
        num_centroids=IVF_CENTROIDS,
        nprobe=IVF_NPROBE,
        round_to=5,
    )
    return out.select(
        "query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to full 1e-6 convergence on the sf0.001 graph."""
    sf_dir = "/root/testdata/sf0.001"
    edges = edges_from_lineitem(spark, sf_dir)
    pr_edges, vertices = prepare_pagerank_graph(edges)
    n = vertices.count()
    res = PregelRunner(spark, pagerank_spec(n, tol=1e-6)).run(
        pr_edges, vertices=vertices
    )
    return res.state.select("id", F.col("value").alias("rank")).orderBy(
        F.desc("rank"), F.asc("id")
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (keyword extraction)."""
    return tfidf_top_terms(_docs(spark, sf_dir), k=TFIDF_K)


def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: 20 most frequent word bigrams
    (boilerplate/contamination signatures); TakeOrdered, no global sort."""
    return top_ngrams(_docs(spark, sf_dir), k=TOP_NGRAMS_K)


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form hashes for formatting-invariant exact dedup."""
    return normalize_text(_docs(spark, sf_dir))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hash-sample quotas (domain-weighted corpus curation)."""
    return stratified_sample(
        _docs(spark, sf_dir), STRAT_FRACTIONS, default_fraction=STRAT_DEFAULT
    ).select("doc_id", "source")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel per user (strictly-after
    sequencing in integer microseconds; -1 = step not reached)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(events, steps=FUNNEL_STEPS)


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-in degree assortativity of the directed graph — exact BIGINT
    sufficient statistics, so the correlation is bit-identical across
    engines."""
    return degree_assortativity(edges_from_lineitem(spark, sf_dir))


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (4 subspaces × 4 centroids) — the
    embedding-compression encode pass, shuffle-free."""
    return pq_codes(_emb(spark, sf_dir), m=PQ_M, ksub=PQ_KSUB, dim=EMB_DIM)


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal-independent-set after 4 synchronous rounds — the
    fourth distinct vertex program on the unchanged runner (md5
    priorities, min-combine data plane)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    res = _runner(spark, mis_spec()).run(und, max_supersteps=MIS_ITERS)
    return mis_status(res.state)


def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction: per-vertex top-3 non-adjacent
    candidates by shared-neighbor count, hub middles stop-word-cut at
    degree 40 (never silently — see operators/link_prediction.py)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    return common_neighbor_topk(und, k=LP_K, max_middle_degree=LP_MAX_MID_DEG)


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact 6-token spans (fixed-window exact-substring
    contamination detection; map-side combine absorbs the Zipf span
    distribution)."""
    return repeated_spans(_docs(spark, sf_dir), n=SPAN_N, min_docs=SPAN_MIN_DOCS)


def q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of attribution: most recent view strictly before each purchase
    (running conditional window max — the as-of-join shape without the
    quadratic inequality join)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return last_touch(events, target="purchase", touch="view")


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities, 3 L1-normalized rounds on the directed
    graph (operators/hits.py); oracle = the recurrence unrolled."""
    return hits(edges_from_lineitem(spark, sf_dir), iterations=HITS_ITERS, round_to=6)


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy coloring by iterated Luby MIS — each outer round is one
    Pregel job on the residual graph (Vertex.go:68-88 composition);
    vertices still uncolored after COLOR_ROUNDS surface as -1."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    return greedy_coloring(
        spark,
        und,
        colors=COLOR_ROUNDS,
        inner_rounds=COLOR_INNER,
        make_runner=lambda spec: _runner(spark, spec),
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-7 quantiles of l_extendedprice — distributed selection
    (range Exchange + per-partition windows), no global-order reducer."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return exact_quantiles(lineitem, "l_extendedprice", QUANTILE_QS)


def q_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-arrival temporal reachability from the min orderkey over
    order↔part contact edges timed by o_orderdate — the fifth distinct
    vertex program on the unchanged runner (operators/temporal.py)."""
    tedges = temporal_edges_from_lineitem(spark, sf_dir)
    src = _sssp_source(spark, sf_dir)
    res = _runner(spark, earliest_arrival_spec(source=src)).run(
        tedges, max_supersteps=TEMPORAL_ITERS
    )
    return res.state.filter(~F.isnan("value") & (F.col("value") < 1e17)).select(
        "id", F.col("value").alias("arrival")
    )


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-transition walks of length 3 from every source
    vertex — the DeepWalk-style sequence sampler (operators/walks.py)."""
    return random_walks(edges_from_lineitem(spark, sf_dir), length=WALK_LEN)


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC of the parity-directed (cyclic) lineitem graph via trim +
    FW/BW min-label peeling — both label passes are the engine's own
    cc_spec BSP run over directed edges (operators/scc.py).  Parameters
    verified convergent at every shipped SF (trim depth 1, f/b spread
    ≤ 11 supersteps, one peel round); strict=True would raise rather
    than return a partial labeling."""
    return scc_fwbw(
        spark,
        parity_edges_from_lineitem(spark, sf_dir),
        inner_iters=SCC_INNER,
        trim_rounds=SCC_TRIM,
        outer_rounds=1,
        strict=True,
        lineage_break_every=3,
        steps_per_action=2,
    )


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 Lloyd iterations + final assignment over the embedding table,
    seeded from vec_ids 0..7 — one broadcast-literal projection + one
    K-key aggregate per iteration (operators/kmeans.py)."""
    return kmeans_assign(
        _emb(spark, sf_dir), k=KMEANS_K, iters=KMEANS_ITERS, dim=EMB_DIM
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals over (returnflag, linestatus): one Expand + one
    tiny-key hash aggregate; decimal(38,9) sums (operators/relational.py)."""
    return revenue_rollup(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))


def q_docs_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (source, lang) of the documents table — all four
    grouping sets in one aggregate (operators/relational.py)."""
    return docs_cube(_docs(spark, sf_dir))


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction: per-vertex top-3 by Σ 1/ln(deg) over
    shared neighbors, same wedge cap as link_predict; scores ranked and
    returned at 6dp for cross-engine stability."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    return adamic_adar_topk(und, k=LP_K, max_middle_degree=LP_MAX_MID_DEG)


def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled harmonic centrality: Σ 1/d over the 4 smallest orderkey
    pivots within 4 hops, via one multi-source BFS (operators/bfs.py) —
    all pivots share each frontier expansion's edge scan."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pivots = [
        r[0]
        for r in li.select(F.col("l_orderkey").cast("long"))
        .distinct()
        .orderBy("l_orderkey")
        .limit(HARMONIC_PIVOTS)
        .collect()
    ]
    return harmonic_centrality(und, pivots, hops=HARMONIC_HOPS)


def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the order↔part membership into a part
    co-purchase graph, per-part top-3 by shared orders; basket-size
    stop-word cut at 40 (operators/projection.py)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    membership = li.select(
        F.col("l_partkey").cast("long").alias("entity"),
        F.col("l_orderkey").cast("long").alias("container"),
    ).distinct()
    return cooccurrence_topk(
        membership, k=LP_K, max_container_size=COPURCHASE_MAX_BASKET
    )


def q_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-cut and balance of two vertex-placement strategies over the
    undirected graph — naive id-mod versus community-aligned (CC label
    mod P): the pre-launch numbers that decide per-superstep network
    cost at cluster scale (operators/graph_metrics.partition_quality)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    comp = q_cc(spark, sf_dir)
    a = comp.select(
        F.lit("mod").alias("strategy"),
        "id",
        (F.col("id") % PQUAL_PARTS).alias("part"),
    ).unionByName(
        comp.select(
            F.lit("community").alias("strategy"),
            "id",
            (F.col("component") % PQUAL_PARTS).alias("part"),
        )
    )
    return partition_quality(und, a, PQUAL_PARTS)


def q_incremental_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank maintenance: PageRank the even-dst subgraph (3 steps from
    uniform), then warm-start 3 steps over the FULL graph seeded from
    those ranks (new vertices at 1/N) — the PageRank analogue of
    incremental_cc (operators/pagerank.incremental_pagerank)."""
    edges = edges_from_lineitem(spark, sf_dir)
    sub = edges.filter(F.col("dst") % 2 == 0)
    sub_edges, sub_vertices = prepare_pagerank_graph(sub)
    n_a = sub_vertices.count()
    prior = _runner(spark, pagerank_spec(n_a, damping=0.85, tol=1e-12)).run(
        sub_edges, vertices=sub_vertices, max_supersteps=INC_PR_PRIOR_ITERS
    )
    res = incremental_pagerank(
        spark,
        edges,
        prior.state.select("id", "value"),
        max_supersteps=INC_PR_ITERS,
        lineage_break_every=3,
        steps_per_action=2,
    )
    return res.state.select("id", F.round(F.col("value"), 6).alias("rank"))


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE power-law exponent of the degree distribution (is this graph
    web-shaped?) — operators/graph_metrics.powerlaw_alpha."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    return powerlaw_alpha(und, d_min=PL_DMIN)


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the co-purchase graph: edges in ≥1 triangle after 3
    peel rounds — the edge-level cohesion filter a hub cannot fake
    (operators/ktruss.py)."""
    return ktruss_peel(
        _copurchase_edges(spark, sf_dir), k=KTRUSS_K, rounds=KTRUSS_ROUNDS
    ).select("src", "dst", F.col("support").cast("long").alias("support"))


def q_hop_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-function sample: (dist, n_pairs, cum_frac) over the
    4-pivot multi-source BFS — the distance distribution whose 0.9
    quantile is the standard effective-diameter estimate (ANF/HyperANF
    family, here exact over the pivot sample).  cum_frac is exact
    integer division rounded at 6dp."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pivots = [
        r[0]
        for r in li.select(F.col("l_orderkey").cast("long"))
        .distinct()
        .orderBy("l_orderkey")
        .limit(HARMONIC_PIVOTS)
        .collect()
    ]
    d = msbfs_distances(und, pivots, hops=HARMONIC_HOPS)
    hist = d.groupBy("dist").agg(F.count(F.lit(1)).alias("n_pairs"))
    total = d.count()
    w = (
        hist.withColumn(
            "cum",
            F.sum("n_pairs").over(
                Window.orderBy("dist").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .select(
            F.col("dist").cast("long").alias("dist"),
            "n_pairs",
            F.round(F.col("cum").cast("double") / F.lit(float(total)), 6).alias(
                "cum_frac"
            ),
        )
    )
    return w


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed 3-term query — the query
    surface TF-IDF features exist for (operators/terms.bm25_topk)."""
    return bm25_topk(_docs(spark, sf_dir), list(BM25_TERMS), k=BM25_K)


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient on the co-purchase graph:
    2·triangles(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2 — composes the
    degree-ordered triangle counts with the degree table; exact
    integers into one IEEE division, 6dp round."""
    from pregel_golang_implementation_spark.operators.triangles import (
        triangles_per_vertex,
    )

    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangles_per_vertex(spark, e).select(
        "id", F.col("triangles").cast("long").alias("_t")
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("_t"), F.lit(0)).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                6,
            ).alias("coeff"),
        )
    )


def q_label_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spreading over the order↔part graph:
    every 10th order is seeded with its customer's nation; 4 rounds of
    fixed-seed mode adoption expand the labels through the bipartite
    alternation (operators/label_propagation.seeded_label_spread)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    seeds = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").cast("long").alias("id"),
            F.col("c_nationkey").cast("long").alias("lbl"),
        )
    )
    return seeded_label_spread(und, seeds, rounds=SPREAD_ROUNDS)


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy — the
    gibberish/encoding-junk quality signal (operators/textstats.py)."""
    return char_entropy(_docs(spark, sf_dir))


def q_square_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-cycle (square) count — THE clustering motif on a bipartite
    graph, where triangles cannot exist; capped wedge middles reported
    in the result row (operators/graph_metrics.square_count)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    return square_count(und, max_middle_degree=LP_MAX_MID_DEG)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample without replacement (Efraimidis–Spirakis
    exponential race, deterministic md5 draws): the 50 documents winning
    the -ln(u)/n_chars race — distributed TakeOrderedAndProject, no
    global sort (operators/sampling.py)."""
    return weighted_sample_topk(
        _docs(spark, sf_dir), k=WSAMPLE_K, weight_col="n_chars"
    )


def q_hll_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog estimate of the corpus' distinct
    3-gram shingle count — one scan + one 256-key aggregate, NO distinct
    shuffle; identical registers and estimate in any engine
    (operators/sketches.py)."""
    sh = word_shingles(_docs(spark, sf_dir), n=3)
    return hll_distinct(sh, "shingle")


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled betweenness (Brandes from the 2 smallest orderkey pivots,
    4 hops): BFS-layer σ path counts forward, δ dependency accumulation
    backward — each phase one join + one keyed sum per layer, all pivots
    sharing every scan (operators/betweenness.py)."""
    und = symmetrize(edges_from_lineitem(spark, sf_dir))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pivots = [
        r[0]
        for r in li.select(F.col("l_orderkey").cast("long"))
        .distinct()
        .orderBy("l_orderkey")
        .limit(BETWEEN_PIVOTS)
        .collect()
    ]
    return betweenness_sampled(und, pivots, hops=BETWEEN_HOPS)


def q_quality_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-selection composition: keep documents at or above the
    corpus P90 of stopword_ratio — exact_quantiles picks the cutoff
    (distributed selection, one scalar to the driver), the filter is a
    scan-pushed predicate.  The stated purpose of the quantile operator
    (quantiles.py docstring), now under the driver gate end-to-end."""
    qdf = quality_score(_docs(spark, sf_dir))
    thr = exact_quantiles(qdf, "stopword_ratio", [QUALITY_CUT_Q]).first()["value"]
    return qdf.filter(F.col("stopword_ratio") >= F.lit(thr)).select(
        "doc_id", "stopword_ratio"
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: where each document lands in the
    capacity-2048 packed token stream (tokens ≈ n_chars), via the
    distributed two-phase prefix sum (operators/packing.py) — one range
    Exchange + parallel per-partition windows, no global-order reducer."""
    return pack_sequences(
        _docs(spark, sf_dir).select("doc_id", F.col("n_chars").alias("tokens")),
        capacity=PACK_CAPACITY,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_5iter": q_pagerank,
        "pagerank_salted": q_pagerank_salted,
        "cc_6iter": q_cc,
        "checkpoint_resume": q_checkpoint_resume,
        "component_sizes": q_component_sizes,
        "degree_histogram": q_degree_histogram,
        "simhash_near_dups": q_simhash_near_dups,
        "incremental_cc": q_incremental_cc,
        "sssp_4iter": q_sssp,
        "lpa_2iter": q_lpa,
        "lpa_4iter": q_lpa4,
        "scatter_combine_min": q_scatter_combine,
        "vertex_degrees": q_degrees,
        "frontier_after_2": q_frontier,
        "triangle_count": q_triangles,
        "triangles_per_vertex": q_triangles_per_vertex,
        "kcore_peel_3": q_kcore,
        "ivf_topk": q_ivf_topk,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash,
        "lsh_candidate_pairs": q_lsh_pairs,
        "ngram_jaccard": q_jaccard,
        "simhash16": q_simhash,
        "token_stats": q_token_stats,
        "quality_score": q_quality,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "embedding_knn": q_knn,
        "srp_buckets": q_srp_buckets,
        "jaccard_candidates": q_jaccard_candidates,
        "dedup_resolve": q_dedup_resolve,
        "ann_candidates": q_ann_candidates,
        "ann_topk": q_ann_topk,
        "knn_graph": q_knn_graph,
        "embedding_near_dups": q_embedding_near_dups,
        "decontaminate": q_decontaminate,
        "event_window_stats": q_event_window_stats,
        "sessionize": q_sessionize,
        "hash_sample": q_hash_sample,
        "corpus_mix": q_corpus_mix,
        "pagerank_top10": q_pagerank_top10,
        "personalized_pagerank": q_ppr,
        "pagerank_weighted": q_pagerank_weighted,
        "tfidf_top3": q_tfidf,
        "top_bigrams": q_top_bigrams,
        "text_normalize": q_text_normalize,
        "stratified_sample": q_stratified_sample,
        "event_funnel": q_event_funnel,
        "assortativity": q_assortativity,
        "pq_codes": q_pq_codes,
        "mis_4iter": q_mis,
        "link_predict": q_link_predict,
        "repeated_spans": q_repeated_spans,
        "last_touch": q_last_touch,
        "hits_3iter": q_hits,
        "greedy_coloring": q_coloring,
        "quantiles_exact": q_quantiles,
        "random_walks": q_random_walks,
        "temporal_reach": q_temporal_reach,
        "scc_fwbw": q_scc,
        "kmeans_2iter": q_kmeans,
        "revenue_rollup": q_revenue_rollup,
        "docs_cube": q_docs_cube,
        "adamic_adar": q_adamic_adar,
        "harmonic_4src": q_harmonic,
        "copurchase_topk": q_copurchase,
        "pack_sequences": q_pack_sequences,
        "quality_p90_cut": q_quality_p90,
        "betweenness_2src": q_betweenness,
        "hll_shingles": q_hll_shingles,
        "weighted_sample": q_weighted_sample,
        "square_count": q_square_count,
        "char_entropy": q_char_entropy,
        "label_spread": q_label_spread,
        "clustering_coeff": q_clustering_coeff,
        "bm25_topk": q_bm25,
        "hop_distribution": q_hop_distribution,
        "ktruss_3": q_ktruss,
        "powerlaw_alpha": q_powerlaw_alpha,
        "incremental_pagerank": q_incremental_pagerank,
        "partition_quality": q_partition_quality,
    }


# ------------------------------------------------------------- oracle SQL

_E = (
    "e AS (SELECT l_orderkey AS src, 10000000 + l_partkey AS dst, "
    "CAST(min(l_linenumber) AS DOUBLE) AS weight FROM lineitem GROUP BY 1, 2)"
)
_U = "u AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)"
_UW = (
    "uw AS (SELECT src, dst, min(weight) AS weight FROM "
    "(SELECT src, dst, weight FROM e UNION ALL SELECT dst, src, weight FROM e) "
    "GROUP BY 1, 2)"
)
_V = "v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)"


def _materialize(sql: str) -> str:
    """Force DuckDB to MATERIALIZE every CTE.  The unrolled iterative
    oracles reference each s_{k-1} from multiple places (message CTE,
    dangling CTE, carry-through), so inlined CTEs re-evaluate the whole
    chain ~3^k times — the SQL twin of the engine's own plan-doubling
    hazard (fixed there by localCheckpoint, here by materialization).
    Measured: the 5-step PageRank oracle at sf0.1 spilled >70 GB inlined;
    materialized it runs in seconds."""
    return sql.replace(" AS (", " AS MATERIALIZED (")


def _pagerank_sql(iters: int, damping: float = 0.85, weighted: bool = False) -> str:
    flow = "p.r * e.weight / deg.outdeg" if weighted else "p.r / deg.outdeg"
    degexpr = "SUM(weight)" if weighted else "COUNT(*)"
    parts = [
        _E,
        _V,
        f"deg AS (SELECT src, {degexpr} AS outdeg FROM e GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v)",
        "s0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM v)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"d{k} AS (SELECT COALESCE(SUM(p.r), 0) AS dm FROM {p} p "
            f"LEFT JOIN deg ON p.id = deg.src WHERE deg.src IS NULL)"
        )
        parts.append(
            f"m{k} AS (SELECT e.dst AS id, SUM({flow}) AS s "
            f"FROM {p} p JOIN e ON p.id = e.src JOIN deg ON deg.src = e.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"s{k} AS (SELECT v.id, (1 - {damping}) / (SELECT n FROM nn) + "
            f"{damping} * (COALESCE(m{k}.s, 0) + (SELECT dm FROM d{k}) / (SELECT n FROM nn)) AS r "
            f"FROM v LEFT JOIN m{k} ON v.id = m{k}.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(ROUND(r, 6) AS DOUBLE) AS rank FROM s{iters}"
    )


def _ppr_sql(iters: int, damping: float = 0.85) -> str:
    """Oracle twin of q_ppr: same recurrence with teleport vector p
    concentrated on the min-orderkey vertex; dangling mass teleports to p."""
    parts = [
        _E,
        _V,
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "src0 AS (SELECT MIN(l_orderkey) AS s FROM lineitem)",
        "pv AS (SELECT id, CASE WHEN id = (SELECT s FROM src0) THEN 1.0 ELSE 0.0 END AS p FROM v)",
        "s0 AS (SELECT id, p AS r FROM pv)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"d{k} AS (SELECT COALESCE(SUM(p.r), 0) AS dm FROM {p} p "
            f"LEFT JOIN deg ON p.id = deg.src WHERE deg.src IS NULL)"
        )
        parts.append(
            f"m{k} AS (SELECT e.dst AS id, SUM(p.r / deg.outdeg) AS s "
            f"FROM {p} p JOIN e ON p.id = e.src JOIN deg ON deg.src = e.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"s{k} AS (SELECT pv.id, (1 - {damping}) * pv.p + "
            f"{damping} * (COALESCE(m{k}.s, 0) + (SELECT dm FROM d{k}) * pv.p) AS r "
            f"FROM pv LEFT JOIN m{k} ON pv.id = m{k}.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(ROUND(r, 6) AS DOUBLE) AS rank FROM s{iters}"
    )


def _cc_sql(iters: int) -> str:
    parts = [_E, _U, _V, "s0 AS (SELECT id, id AS val FROM v)"]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"m{k} AS (SELECT u.dst AS id, MIN(p.val) AS mv FROM {p} p "
            f"JOIN u ON p.id = u.src GROUP BY u.dst)"
        )
        parts.append(
            f"s{k} AS (SELECT {p}.id, LEAST({p}.val, COALESCE(m{k}.mv, {p}.val)) AS val "
            f"FROM {p} LEFT JOIN m{k} ON {p}.id = m{k}.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(val AS BIGINT) AS component FROM s{iters}"
    )


def _sssp_sql(iters: int) -> str:
    inf = "1e300"
    parts = [
        _E,
        _UW,
        _V,
        "src0 AS (SELECT MIN(l_orderkey) AS s FROM lineitem)",
        f"s0 AS (SELECT id, CASE WHEN id = (SELECT s FROM src0) THEN 0.0 ELSE {inf} END AS val FROM v)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"m{k} AS (SELECT uw.dst AS id, MIN(p.val + uw.weight) AS mv FROM {p} p "
            f"JOIN uw ON p.id = uw.src WHERE p.val < 1e17 GROUP BY uw.dst)"
        )
        parts.append(
            f"s{k} AS (SELECT {p}.id, LEAST({p}.val, COALESCE(m{k}.mv, {p}.val)) AS val "
            f"FROM {p} LEFT JOIN m{k} ON {p}.id = m{k}.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, val AS distance FROM s{iters} WHERE val < 1e17"
    )


def _incremental_cc_sql(prior_iters: int, iters: int) -> str:
    """Oracle twin of q_incremental_cc: hash-min over the even-dst
    subgraph for ``prior_iters`` steps, then seeded hash-min over the full
    graph for ``iters`` steps (missing vertices seed at their own id)."""
    parts = [
        _E,
        _U,
        _V,
        "ea AS (SELECT src, dst FROM e WHERE dst % 2 = 0)",
        "ua AS (SELECT src, dst FROM ea UNION SELECT dst, src FROM ea)",
        "va AS (SELECT src AS id FROM ea UNION SELECT dst AS id FROM ea)",
        "a0 AS (SELECT id, id AS val FROM va)",
    ]
    for k in range(1, prior_iters + 1):
        p = f"a{k - 1}"
        parts.append(
            f"am{k} AS (SELECT ua.dst AS id, MIN(p.val) AS mv FROM {p} p "
            f"JOIN ua ON p.id = ua.src GROUP BY ua.dst)"
        )
        parts.append(
            f"a{k} AS (SELECT {p}.id, LEAST({p}.val, COALESCE(am{k}.mv, {p}.val)) AS val "
            f"FROM {p} LEFT JOIN am{k} ON {p}.id = am{k}.id)"
        )
    parts.append(
        f"s0 AS (SELECT v.id, COALESCE(a{prior_iters}.val, v.id) AS val "
        f"FROM v LEFT JOIN a{prior_iters} ON v.id = a{prior_iters}.id)"
    )
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"m{k} AS (SELECT u.dst AS id, MIN(p.val) AS mv FROM {p} p "
            f"JOIN u ON p.id = u.src GROUP BY u.dst)"
        )
        parts.append(
            f"s{k} AS (SELECT {p}.id, LEAST({p}.val, COALESCE(m{k}.mv, {p}.val)) AS val "
            f"FROM {p} LEFT JOIN m{k} ON {p}.id = m{k}.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(val AS BIGINT) AS component FROM s{iters}"
    )


def _lpa_sql(iters: int) -> str:
    parts = [_E, _U, _V, "s0 AS (SELECT id, id AS val FROM v)"]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"c{k} AS (SELECT u.dst AS id, p.val AS lbl, COUNT(*) AS cnt FROM {p} p "
            f"JOIN u ON p.id = u.src GROUP BY 1, 2)"
        )
        parts.append(
            f"t{k} AS (SELECT id, lbl, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS rn FROM c{k})"
        )
        parts.append(
            f"s{k} AS (SELECT {p}.id, COALESCE(t.lbl, {p}.val) AS val FROM {p} "
            f"LEFT JOIN (SELECT id, lbl FROM t{k} WHERE rn = 1) t ON {p}.id = t.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(val AS BIGINT) AS label FROM s{iters}"
    )


_CC2_ACTIVE_SQL = _materialize(
    "WITH "
    + ", ".join(
        [
            _E,
            _U,
            _V,
            "s0 AS (SELECT id, id AS val FROM v)",
            "m1 AS (SELECT u.dst AS id, MIN(p.val) AS mv FROM s0 p JOIN u ON p.id = u.src GROUP BY u.dst)",
            "s1 AS (SELECT s0.id, LEAST(s0.val, COALESCE(m1.mv, s0.val)) AS val FROM s0 LEFT JOIN m1 ON s0.id = m1.id)",
            "m2 AS (SELECT u.dst AS id, MIN(p.val) AS mv FROM s1 p JOIN u ON p.id = u.src GROUP BY u.dst)",
            "s2 AS (SELECT s1.id, LEAST(s1.val, COALESCE(m2.mv, s1.val)) AS val FROM s1 LEFT JOIN m2 ON s1.id = m2.id)",
        ]
    )
    + " SELECT s2.id FROM s2 JOIN s1 ON s2.id = s1.id WHERE s2.val < s1.val"
)

def _shingles_sql(src: str = "documents") -> str:
    return (
        f"toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM {src}), "
        "sh0 AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN "
        "[w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in generate_series(1, len(w) - 2)] "
        "ELSE [array_to_string(w, ' ')] END AS shl FROM toks), "
        "sh AS (SELECT DISTINCT doc_id, unnest(shl) AS shingle FROM sh0)"
    )


_SHINGLES = _shingles_sql("documents")

_SIMHASH16_SQL = (
    "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok FROM documents), "
    "h AS (SELECT doc_id, md5(tok) AS hh FROM toks), "
    "vv AS (SELECT doc_id, unnest(generate_series(0, 15)) AS j, hh FROM h), "
    "votes AS (SELECT doc_id, j, CASE WHEN substr(hh, j + 1, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS vt FROM vv), "
    "bitsum AS (SELECT doc_id, j, SUM(vt) AS s FROM votes GROUP BY 1, 2) "
    "SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN POW(2, j) ELSE 0 END) AS BIGINT) AS simhash "
    "FROM bitsum GROUP BY 1"
)

def _minhash_sql(src: str = "documents") -> str:
    return (
        _shingles_sql(src) + ", "
        "sd AS (SELECT doc_id, shingle, unnest(generate_series(0, 15)) AS seed FROM sh), "
        "sig AS (SELECT doc_id, seed, MIN(md5(seed::VARCHAR || '|' || shingle)) AS minhash "
        "FROM sd GROUP BY 1, 2)"
    )


def _bands_sql(src: str = "documents") -> str:
    return (
        _minhash_sql(src) + ", "
        "bands AS (SELECT doc_id, seed // 4 AS band, "
        "md5(string_agg(lpad(seed::VARCHAR, 4, '0') || ':' || minhash, ',' "
        "ORDER BY lpad(seed::VARCHAR, 4, '0') || ':' || minhash)) AS band_key "
        "FROM sig GROUP BY 1, 2)"
    )


_MINHASH = _minhash_sql("documents")
_BANDS = _bands_sql("documents")

_CAND = (
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key "
    "AND a.doc_id < b.doc_id)"
)

_VERIFY = (
    "sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1), "
    "inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter FROM cand c "
    "JOIN sh a ON a.doc_id = c.doc_a "
    "JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle GROUP BY 1, 2)"
)


def _dedup_resolve_sql(iters: int, threshold: float) -> str:
    """Oracle twin of near_dup_clusters: exact collapse → LSH over
    representatives → Jaccard verify → (exact ∪ verified) edges → `iters`
    hash-min supersteps unrolled as chained CTEs."""
    parts = [
        "dh AS (SELECT doc_id, md5(text) AS h FROM documents)",
        "grp AS (SELECT h, MIN(doc_id) AS rep FROM dh GROUP BY 1)",
        "exact_edges AS (SELECT grp.rep AS src, dh.doc_id AS dst FROM dh "
        "JOIN grp ON dh.h = grp.h WHERE dh.doc_id <> grp.rep)",
        "reps AS (SELECT d.doc_id, d.text FROM documents d JOIN grp ON d.doc_id = grp.rep)",
        _bands_sql("reps"),
        _CAND,
        _VERIFY,
        f"ver AS (SELECT doc_a, doc_b FROM inter "
        f"JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id "
        f"WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= {threshold})",
        "e0 AS (SELECT src, dst FROM exact_edges UNION SELECT doc_a, doc_b FROM ver)",
        "u AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0)",
        "v AS (SELECT doc_id AS id FROM documents)",
        "s0 AS (SELECT id, id AS val FROM v)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"m{k} AS (SELECT u.dst AS id, MIN(p.val) AS mv FROM {p} p "
            f"JOIN u ON p.id = u.src GROUP BY u.dst)"
        )
        parts.append(
            f"s{k} AS (SELECT {p}.id, LEAST({p}.val, COALESCE(m{k}.mv, {p}.val)) AS val "
            f"FROM {p} LEFT JOIN m{k} ON {p}.id = m{k}.id)"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id AS doc_id, CAST(val AS BIGINT) AS cluster_id, "
        f"CAST(id = val AS BIGINT) AS is_canonical FROM s{iters}"
    )


def _tfidf_sql(k: int) -> str:
    """Twin of q_tfidf: whitespace tokens, tf per (doc, term), smoothed
    idf = ln((N+1)/(df+1)) + 1, 6dp-rounded BEFORE ranking (ties →
    term asc), top-k per document."""
    return (
        "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term FROM documents), "
        "tk AS (SELECT doc_id, term FROM tok WHERE term <> ''), "
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2), "
        "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), "
        "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
        "sc AS (SELECT tf.doc_id, tf.term, tf.tf, "
        "ROUND(tf.tf * (ln((n.n_docs + 1)::DOUBLE / (df.df + 1)) + 1.0), 6) AS score "
        "FROM tf JOIN df USING (term) CROSS JOIN n), "
        "r AS (SELECT doc_id, term, score, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank FROM sc) "
        f"SELECT doc_id, term, score, rank::BIGINT AS rank FROM r WHERE rank <= {k}"
    )


def _top_bigrams_sql(k: int) -> str:
    return (
        "WITH toked AS (SELECT doc_id, "
        "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks FROM documents), "
        "idx AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM toked), "
        "g AS (SELECT toks[i] || ' ' || toks[i + 1] AS ngram FROM idx), "
        "c AS (SELECT ngram, COUNT(*) AS cnt FROM g GROUP BY 1), "
        "r AS (SELECT ngram, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, ngram ASC) AS rank FROM c) "
        f"SELECT ngram, cnt, rank::BIGINT AS rank FROM r WHERE rank <= {k}"
    )


def _text_normalize_sql() -> str:
    return (
        "SELECT doc_id, md5(norm) AS norm_hash, length(norm)::BIGINT AS n_norm_chars "
        "FROM (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm FROM documents)"
    )


def _stratified_sample_sql() -> str:
    from pregel_golang_implementation_spark.operators.sampling import (
        _strat_threshold,
    )

    cases = " ".join(
        f"WHEN '{g}' THEN '{_strat_threshold(f)}'"
        for g, f in sorted(STRAT_FRACTIONS.items())
    )
    return (
        "SELECT doc_id, source FROM documents "
        "WHERE substr(md5('strat|' || doc_id::VARCHAR), 1, 4) < "
        f"CASE source {cases} ELSE '{_strat_threshold(STRAT_DEFAULT)}' END"
    )


def _funnel_sql(steps: tuple[str, ...]) -> str:
    parts = ["uu AS (SELECT DISTINCT user_id FROM events)"]
    prev = None
    for i, step in enumerate(steps, start=1):
        if prev is None:
            parts.append(
                f"s{i} AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events "
                f"WHERE event_type = '{step}' GROUP BY 1)"
            )
        else:
            parts.append(
                f"s{i} AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e "
                f"JOIN {prev} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{step}' AND epoch_us(e.ts) > p.t GROUP BY 1)"
            )
        prev = f"s{i}"
    cols = ", ".join(
        f"COALESCE(s{i}.t, -1) AS t_{s}_us" for i, s in enumerate(steps, start=1)
    )
    depth = " + ".join(
        f"CASE WHEN s{i}.t IS NULL THEN 0 ELSE 1 END"
        for i in range(1, len(steps) + 1)
    )
    joins = " ".join(
        f"LEFT JOIN s{i} ON uu.user_id = s{i}.user_id"
        for i in range(1, len(steps) + 1)
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT uu.user_id, {cols}, CAST({depth} AS BIGINT) AS depth FROM uu {joins}"
    )


def _assortativity_sql() -> str:
    """Twin of q_assortativity — identical exact-integer sufficient
    statistics, so the double formula is bit-identical."""
    return (
        f"WITH {_E}, "
        "od AS (SELECT src, COUNT(*) AS x FROM e GROUP BY 1), "
        "idg AS (SELECT dst, COUNT(*) AS y FROM e GROUP BY 1), "
        "xy AS (SELECT od.x::BIGINT AS x, idg.y::BIGINT AS y "
        "FROM e JOIN od ON e.src = od.src JOIN idg ON e.dst = idg.dst), "
        "s AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy, "
        "SUM(x * y)::BIGINT AS sxy, SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy FROM xy) "
        "SELECT ROUND((n * sxy - sx * sy)::DOUBLE / "
        "(sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)), 6) "
        "AS assortativity FROM s"
    )


def _pq_codes_sql(m: int, ksub: int, dim: int) -> str:
    """Twin of q_pq_codes: md5-ordered sample codebook (row_number - 1 =
    centroid code), per-subspace squared-L2 in the same left-fold index
    order as the engine's F.aggregate, 6dp-rounded before the argmin,
    ties to the smaller code."""
    sub = dim // m
    parts = [
        "cent AS (SELECT ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 "
        f"AS cidx, embedding AS cv FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {ksub})",
        "em AS (SELECT vec_id, embedding AS ev FROM embeddings)",
    ]
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        dist = (
            "ROUND(list_aggregate([(ev[i]::DOUBLE - cv[i]::DOUBLE) * "
            f"(ev[i]::DOUBLE - cv[i]::DOUBLE) for i in generate_series({lo}, {hi})], 'sum'), 6)"
        )
        parts.append(
            f"d{j} AS (SELECT e.vec_id, c.cidx, {dist} AS dist FROM em e CROSS JOIN cent c)"
        )
        parts.append(
            f"a{j} AS (SELECT vec_id, CAST(cidx AS BIGINT) AS code_{j} FROM "
            f"(SELECT vec_id, cidx, ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY dist ASC, cidx ASC) AS rn FROM d{j}) WHERE rn = 1)"
        )
    joins = " ".join(f"JOIN a{j} USING (vec_id)" for j in range(1, m))
    codes = ", ".join(f"code_{j}" for j in range(m))
    return "WITH " + ", ".join(parts) + f" SELECT vec_id, {codes} FROM a0 {joins}"


def _hash48_sql(h: str) -> str:
    """First 12 hex chars of md5 as an exact BIGINT — digit-positional
    sum with power-of-16 literal weights (DuckDB has no base-16 conv;
    every partial sum < 2^48, so this equals Spark's F.conv(...,16,10)
    bit-for-bit)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {t + 1}, 1)) - 1) * {16 ** (11 - t)}"
        for t in range(12)
    )
    return f"CAST({terms} AS BIGINT)"


def _mis_priority_expr(h: str) -> str:
    """The hash48 as an exact integer-valued double (MIS priorities)."""
    return f"CAST({_hash48_sql(h)} AS DOUBLE)"


def _mis_sql(rounds: int) -> str:
    """Twin of q_mis: Luby rounds unrolled.  State per round: IN = -1,
    OUT = 2^48, undecided = priority; min over neighbor states answers
    join/drop (see operators/mis.py docstring for the encoding proof)."""
    out = f"{float(2 ** 48)!r}"
    pri = _mis_priority_expr("md5(id::VARCHAR)")
    parts = [
        _E,
        _U,
        _V,
        f"s0 AS (SELECT id, {pri} AS val FROM v)",
    ]
    for r in range(1, rounds + 1):
        p = f"s{r - 1}"
        parts.append(
            f"m{r} AS (SELECT u.dst AS id, MIN(s.val) AS mn FROM {p} s "
            f"JOIN u ON s.id = u.src GROUP BY u.dst)"
        )
        parts.append(
            f"s{r} AS (SELECT s.id, CASE "
            f"WHEN s.val < 0 OR s.val >= {out} THEN s.val "
            "WHEN m.mn IS NULL THEN -1.0 "
            f"WHEN m.mn < 0 THEN {out} "
            f"WHEN m.mn >= {out} THEN -1.0 "
            "WHEN s.val < m.mn THEN -1.0 "
            f"ELSE s.val END AS val FROM {p} s LEFT JOIN m{r} m ON s.id = m.id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CASE WHEN val < 0 THEN 'in' WHEN val >= {out} THEN 'out' "
        f"ELSE 'undecided' END AS status FROM s{rounds}"
    )


def _coloring_sql(colors: int, inner: int) -> str:
    """Twin of q_coloring: iterated Luby MIS unrolled.  Outer round c:
    residual undirected edges uc{c} (both endpoints uncolored), fresh
    state = md5 priorities over unc{c}, ``inner`` Luby rounds (the
    _mis_sql recurrence), color c to the IN set; uncolored → -1."""
    out = f"{float(2 ** 48)!r}"
    pri = _mis_priority_expr("md5(id::VARCHAR)")
    parts = [
        _E,
        _U,
        _V,
        f"p AS (SELECT id, {pri} AS pri FROM v)",
        "unc0 AS (SELECT id FROM v)",
    ]
    for c in range(colors):
        parts.append(
            f"uc{c} AS (SELECT u.src, u.dst FROM u "
            f"JOIN unc{c} a ON u.src = a.id JOIN unc{c} b ON u.dst = b.id)"
        )
        parts.append(
            f"s{c}_0 AS (SELECT p.id, p.pri AS val FROM p "
            f"JOIN unc{c} x ON p.id = x.id)"
        )
        for r in range(1, inner + 1):
            prev = f"s{c}_{r - 1}"
            parts.append(
                f"m{c}_{r} AS (SELECT uc{c}.dst AS id, MIN(s.val) AS mn FROM {prev} s "
                f"JOIN uc{c} ON s.id = uc{c}.src GROUP BY uc{c}.dst)"
            )
            parts.append(
                f"s{c}_{r} AS (SELECT s.id, CASE "
                f"WHEN s.val < 0 OR s.val >= {out} THEN s.val "
                "WHEN m.mn IS NULL THEN -1.0 "
                f"WHEN m.mn < 0 THEN {out} "
                f"WHEN m.mn >= {out} THEN -1.0 "
                "WHEN s.val < m.mn THEN -1.0 "
                f"ELSE s.val END AS val FROM {prev} s LEFT JOIN m{c}_{r} m ON s.id = m.id)"
            )
        parts.append(
            f"col{c} AS (SELECT id, CAST({c} AS BIGINT) AS color "
            f"FROM s{c}_{inner} WHERE val < 0)"
        )
        parts.append(
            f"unc{c + 1} AS (SELECT n.id FROM unc{c} n "
            f"LEFT JOIN col{c} x ON n.id = x.id WHERE x.id IS NULL)"
        )
    union = " UNION ALL ".join(f"SELECT id, color FROM col{c}" for c in range(colors))
    return (
        "WITH "
        + ", ".join(parts)
        + " "
        + union
        + f" UNION ALL SELECT id, CAST(-1 AS BIGINT) AS color FROM unc{colors}"
    )


def _quantiles_sql(qs) -> str:
    """Twin of q_quantiles: the type-7 formula written out on explicit
    order statistics (row_number over the sorted values) — no reliance
    on DuckDB's quantile_cont semantics matching anything."""
    qlist = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in qs)
    return (
        "WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL), "
        "r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM s), "
        "n AS (SELECT COUNT(*) AS n FROM s), "
        f"t AS (SELECT UNNEST([{qlist}]) AS q), "
        "b AS (SELECT q, 1.0 + (n.n - 1) * q AS k FROM t, n), "
        "g AS (SELECT q, CAST(FLOOR(k) AS BIGINT) AS lo, "
        "CAST(CEIL(k) AS BIGINT) AS hi, k - FLOOR(k) AS frac FROM b) "
        "SELECT g.q AS quantile, ROUND(rlo.v + g.frac * (rhi.v - rlo.v), 6) AS value "
        "FROM g JOIN r rlo ON rlo.rn = g.lo JOIN r rhi ON rhi.rn = g.hi"
    )


def _walks_sql(length: int) -> str:
    """Twin of q_random_walks: L unrolled transition joins; neighbor
    rank = row_number-1 per src ordered by dst; pick = hash48(node#t)
    mod outdeg."""
    parts = [
        _E,
        "rk AS (SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 "
        "AS rank, COUNT(*) OVER (PARTITION BY src) AS deg FROM e)",
        "w0 AS (SELECT DISTINCT src AS start, src AS node FROM e)",
    ]
    selects = ["SELECT start, CAST(0 AS BIGINT) AS step, node FROM w0"]
    for t in range(1, length + 1):
        h = _hash48_sql(f"md5(w{t - 1}.node::VARCHAR || '#' || '{t}')")
        parts.append(
            f"w{t} AS (SELECT w{t - 1}.start, rk.dst AS node FROM w{t - 1} "
            f"JOIN rk ON w{t - 1}.node = rk.src AND rk.rank = ({h}) % rk.deg)"
        )
        selects.append(f"SELECT start, CAST({t} AS BIGINT) AS step, node FROM w{t}")
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(selects)


def _temporal_sql(iters: int) -> str:
    """Twin of q_temporal_reach: full-relaxation rounds (idempotent
    re-sends equal the engine's frontier runs — operators/temporal.py
    docstring).  Edge time = epoch_us(o_orderdate), the repo's UTC
    unix_micros parity trick."""
    inf = "CAST('inf' AS DOUBLE)"
    parts = [
        "te AS (SELECT src, dst, MIN(t) AS t FROM ("
        "SELECT l_orderkey AS src, 10000000 + l_partkey AS dst, "
        "CAST(epoch_us(o_orderdate) AS DOUBLE) AS t "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "UNION ALL "
        "SELECT 10000000 + l_partkey AS src, l_orderkey AS dst, "
        "CAST(epoch_us(o_orderdate) AS DOUBLE) AS t "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        ") GROUP BY 1, 2)",
        "tv AS (SELECT DISTINCT src AS id FROM te)",
        "sel AS (SELECT MIN(l_orderkey) AS s FROM lineitem)",
        f"a0 AS (SELECT id, CASE WHEN id = (SELECT s FROM sel) THEN 0.0 "
        f"ELSE {inf} END AS val FROM tv)",
    ]
    for k in range(1, iters + 1):
        prev = f"a{k - 1}"
        parts.append(
            f"m{k} AS (SELECT te.dst AS id, MIN(te.t) AS mn FROM {prev} a "
            f"JOIN te ON a.id = te.src WHERE a.val <= te.t GROUP BY te.dst)"
        )
        parts.append(
            f"a{k} AS (SELECT a.id, LEAST(a.val, COALESCE(m.mn, a.val)) AS val "
            f"FROM {prev} a LEFT JOIN m{k} m ON a.id = m.id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, val AS arrival FROM a{iters} WHERE val < 1e17"
    )


def _link_predict_sql(k: int, cap: int) -> str:
    """Twin of q_link_predict: wedges through middles of degree ≤ cap,
    pair counts, anti-join existing edges, mirrored per-vertex rank."""
    return (
        f"WITH {_E}, {_U}, "
        "deg AS (SELECT src, COUNT(*) AS d FROM u GROUP BY 1), "
        f"em AS (SELECT u.src, u.dst FROM u JOIN deg ON u.src = deg.src WHERE deg.d <= {cap}), "
        "pr AS (SELECT l.dst AS a, r.dst AS b FROM em l JOIN em r ON l.src = r.src "
        "WHERE l.dst < r.dst), "
        "cm AS (SELECT a, b, COUNT(*) AS common FROM pr GROUP BY 1, 2), "
        "ne AS (SELECT cm.a, cm.b, cm.common FROM cm LEFT JOIN u "
        "ON cm.a = u.src AND cm.b = u.dst WHERE u.src IS NULL), "
        "mr AS (SELECT a AS id, b AS candidate, common FROM ne "
        "UNION ALL SELECT b AS id, a AS candidate, common FROM ne), "
        "r AS (SELECT id, candidate, common, ROW_NUMBER() OVER "
        "(PARTITION BY id ORDER BY common DESC, candidate ASC) AS rank FROM mr) "
        f"SELECT id, candidate, common, rank::BIGINT AS rank FROM r WHERE rank <= {k}"
    )


def _repeated_spans_sql(n: int, min_docs: int) -> str:
    return (
        "WITH toked AS (SELECT doc_id, "
        "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks FROM documents), "
        f"idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {n} + 2)) AS i FROM toked), "
        f"sp AS (SELECT doc_id, array_to_string(toks[i:i+{n}-1], ' ') AS span FROM idx), "
        "g AS (SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS total_occurrences, "
        "MIN(doc_id) AS min_doc_id FROM sp GROUP BY 1) "
        f"SELECT span, n_docs, total_occurrences, min_doc_id FROM g WHERE n_docs >= {min_docs}"
    )


def _last_touch_sql(target: str = "purchase", touch: str = "view") -> str:
    return (
        "WITH e2 AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events), "
        "w AS (SELECT event_id, user_id, event_type, t, "
        f"MAX(CASE WHEN event_type = '{touch}' THEN t END) OVER "
        "(PARTITION BY user_id ORDER BY t, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_v FROM e2) "
        "SELECT event_id, user_id, t AS t_target_us, "
        "COALESCE(last_v, -1) AS t_touch_us, "
        "CASE WHEN last_v IS NULL THEN -1 ELSE t - last_v END AS gap_us "
        f"FROM w WHERE event_type = '{target}'"
    )


def _hits_sql(iters: int) -> str:
    """Twin of q_hits: authority/hub half-steps unrolled, L1 norm via a
    1-row total subquery, 6dp rounding at the very end (the PageRank
    oracle's determinism recipe)."""
    parts = [_E, _V, "h0 AS (SELECT id, 1.0 AS h FROM v)"]
    for k in range(1, iters + 1):
        parts += [
            f"ar{k} AS (SELECT e.dst AS id, SUM(h.h) AS s FROM e "
            f"JOIN h{k - 1} h ON e.src = h.id GROUP BY e.dst)",
            f"at{k} AS (SELECT SUM(s) AS t FROM ar{k})",
            f"a{k} AS (SELECT v.id, COALESCE(ar{k}.s, 0.0) / (SELECT t FROM at{k}) AS a "
            f"FROM v LEFT JOIN ar{k} ON v.id = ar{k}.id)",
            f"hr{k} AS (SELECT e.src AS id, SUM(a.a) AS s FROM e "
            f"JOIN a{k} a ON e.dst = a.id GROUP BY e.src)",
            f"ht{k} AS (SELECT SUM(s) AS t FROM hr{k})",
            f"h{k} AS (SELECT v.id, COALESCE(hr{k}.s, 0.0) / (SELECT t FROM ht{k}) AS h "
            f"FROM v LEFT JOIN hr{k} ON v.id = hr{k}.id)",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT h.id, ROUND(h.h, 6) AS hub, ROUND(a.a, 6) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON h.id = a.id"
    )


_PE = (
    "pe AS (SELECT DISTINCT CASE WHEN l_linenumber % 2 = 1 THEN l_orderkey "
    "ELSE 10000000 + l_partkey END AS src, "
    "CASE WHEN l_linenumber % 2 = 1 THEN 10000000 + l_partkey "
    "ELSE l_orderkey END AS dst FROM lineitem)"
)


def _scc_sql(inner: int, trim: int) -> str:
    """Twin of q_scc: the same trim → f/b min-label → peel recurrence
    unrolled — trim rounds as semi/anti joins, each label pass as the
    _cc_sql chain over the restricted DIRECTED edge table (forward for
    f, reversed for b), peel where f = b."""
    parts = [_PE, "r0 AS (SELECT src AS id FROM pe UNION SELECT dst FROM pe)"]
    for t in range(1, trim + 1):
        p = f"r{t - 1}"
        parts += [
            f"er{t} AS (SELECT pe.src, pe.dst FROM pe "
            f"JOIN {p} a ON pe.src = a.id JOIN {p} b ON pe.dst = b.id)",
            f"r{t} AS (SELECT r.id FROM {p} r "
            f"JOIN (SELECT DISTINCT dst AS id FROM er{t}) di ON r.id = di.id "
            f"JOIN (SELECT DISTINCT src AS id FROM er{t}) so ON r.id = so.id)",
            f"trim{t} AS (SELECT r.id, r.id AS scc FROM {p} r "
            f"LEFT JOIN r{t} k ON r.id = k.id WHERE k.id IS NULL)",
        ]
    parts += [
        f"fe AS (SELECT pe.src, pe.dst FROM pe "
        f"JOIN r{trim} a ON pe.src = a.id JOIN r{trim} b ON pe.dst = b.id)",
        f"f0 AS (SELECT id, id AS lab FROM r{trim})",
        f"b0 AS (SELECT id, id AS lab FROM r{trim})",
    ]
    for k in range(1, inner + 1):
        parts += [
            f"fm{k} AS (SELECT fe.dst AS id, MIN(p.lab) AS m FROM f{k - 1} p "
            f"JOIN fe ON p.id = fe.src GROUP BY fe.dst)",
            f"f{k} AS (SELECT p.id, LEAST(p.lab, COALESCE(fm{k}.m, p.lab)) AS lab "
            f"FROM f{k - 1} p LEFT JOIN fm{k} ON p.id = fm{k}.id)",
            f"bm{k} AS (SELECT fe.src AS id, MIN(p.lab) AS m FROM b{k - 1} p "
            f"JOIN fe ON p.id = fe.dst GROUP BY fe.src)",
            f"b{k} AS (SELECT p.id, LEAST(p.lab, COALESCE(bm{k}.m, p.lab)) AS lab "
            f"FROM b{k - 1} p LEFT JOIN bm{k} ON p.id = bm{k}.id)",
        ]
    trims = " UNION ALL ".join(
        f"SELECT id, scc FROM trim{t}" for t in range(1, trim + 1)
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f", peel AS (SELECT f.id, f.lab AS scc FROM f{inner} f "
        f"JOIN b{inner} b ON f.id = b.id WHERE f.lab = b.lab) "
        f"SELECT id, CAST(scc AS BIGINT) AS scc FROM "
        f"({trims} UNION ALL SELECT id, scc FROM peel)"
    )


def _kmeans_sql(k: int, iters: int) -> str:
    """Twin of q_kmeans: per-dimension unnest, Lloyd iterations unrolled;
    both engines compare ROUND(dist², 6) with cluster-index tie-break and
    round centroids to 6dp between iterations, so double-sum order can
    never flip an assignment."""
    parts = [
        "pts AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos, "
        "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cl, pos, ROUND(v, 6) AS v FROM pts "
        f"WHERE vec_id < {k})",
    ]
    for i in range(1, iters + 1):
        parts += [
            f"d{i} AS (SELECT p.vec_id, c.cl, "
            f"ROUND(SUM((p.v - c.v) * (p.v - c.v)), 6) AS d "
            f"FROM pts p JOIN c{i - 1} c ON p.pos = c.pos GROUP BY 1, 2)",
            f"a{i} AS (SELECT vec_id, cl FROM (SELECT vec_id, cl, ROW_NUMBER() "
            f"OVER (PARTITION BY vec_id ORDER BY d ASC, cl ASC) AS rn FROM d{i}) "
            f"WHERE rn = 1)",
            f"m{i} AS (SELECT a.cl, p.pos, ROUND(AVG(p.v), 6) AS v FROM a{i} a "
            f"JOIN pts p ON a.vec_id = p.vec_id GROUP BY 1, 2)",
            f"c{i} AS (SELECT c.cl, c.pos, COALESCE(m.v, c.v) AS v FROM c{i - 1} c "
            f"LEFT JOIN m{i} m ON c.cl = m.cl AND c.pos = m.pos)",
        ]
    parts += [
        f"df AS (SELECT p.vec_id, c.cl, "
        f"ROUND(SUM((p.v - c.v) * (p.v - c.v)), 6) AS d "
        f"FROM pts p JOIN c{iters} c ON p.pos = c.pos GROUP BY 1, 2)",
        "af AS (SELECT vec_id, cl FROM (SELECT vec_id, cl, ROW_NUMBER() OVER "
        "(PARTITION BY vec_id ORDER BY d ASC, cl ASC) AS rn FROM df) WHERE rn = 1)",
    ]
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM af"
    )


_ROLLUP_SQL = (
    "SELECT COALESCE(l_returnflag, 'ALL') AS return_flag, "
    "COALESCE(l_linestatus, 'ALL') AS line_status, "
    "COUNT(*) AS n_items, "
    "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,9))), 6) AS DOUBLE) AS sum_qty, "
    "CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,9))), 6) "
    "AS DOUBLE) AS revenue "
    "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
)

_DOCS_CUBE_SQL = (
    "SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang, "
    "COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY CUBE(source, lang)"
)


def _adamic_adar_sql(k: int, cap: int) -> str:
    """Twin of q_adamic_adar: _link_predict_sql with the middle carrying
    weight 1/ln(deg); scores rounded to 6dp BEFORE ranking in both
    engines (tie → smaller candidate)."""
    return (
        f"WITH {_E}, {_U}, "
        "deg AS (SELECT src, COUNT(*) AS d FROM u GROUP BY 1), "
        f"em AS (SELECT u.src, u.dst, 1.0 / ln(deg.d) AS w FROM u "
        f"JOIN deg ON u.src = deg.src WHERE deg.d <= {cap} AND deg.d >= 2), "
        "pr AS (SELECT l.dst AS a, r.dst AS b, l.w FROM em l JOIN em r "
        "ON l.src = r.src WHERE l.dst < r.dst), "
        "sc AS (SELECT a, b, ROUND(SUM(w), 6) AS score FROM pr GROUP BY 1, 2), "
        "ne AS (SELECT sc.a, sc.b, sc.score FROM sc LEFT JOIN u "
        "ON sc.a = u.src AND sc.b = u.dst WHERE u.src IS NULL), "
        "mr AS (SELECT a AS id, b AS candidate, score FROM ne "
        "UNION ALL SELECT b AS id, a AS candidate, score FROM ne), "
        "r AS (SELECT id, candidate, score, ROW_NUMBER() OVER "
        "(PARTITION BY id ORDER BY score DESC, candidate ASC) AS rank FROM mr) "
        f"SELECT id, candidate, score, rank::BIGINT AS rank FROM r WHERE rank <= {k}"
    )


def _harmonic_sql(pivots: int, hops: int) -> str:
    """Twin of q_harmonic: multi-source BFS layers unrolled — each hop
    expands only the newest frontier, anti-joins the accumulated
    distance table, then Σ 1/d per vertex at the end."""
    parts = [
        _E,
        _U,
        f"pvt AS (SELECT l_orderkey AS pv FROM (SELECT DISTINCT l_orderkey "
        f"FROM lineitem ORDER BY 1 LIMIT {pivots}))",
        "d0 AS (SELECT pv AS id, pv, 0 AS dist FROM pvt)",
        "fr0 AS (SELECT id, pv, dist FROM d0)",
    ]
    for h in range(1, hops + 1):
        parts += [
            f"rh{h} AS (SELECT DISTINCT u.dst AS id, f.pv, {h} AS dist "
            f"FROM fr{h - 1} f JOIN u ON f.id = u.src)",
            f"fr{h} AS (SELECT r.id, r.pv, r.dist FROM rh{h} r "
            f"LEFT JOIN d{h - 1} d ON r.id = d.id AND r.pv = d.pv "
            f"WHERE d.id IS NULL)",
            f"d{h} AS (SELECT * FROM d{h - 1} UNION ALL SELECT * FROM fr{h})",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, ROUND(SUM(1.0 / dist), 6) AS harmonic FROM d{hops} "
        f"WHERE dist > 0 GROUP BY id"
    )


def _copurchase_sql(k: int, cap: int) -> str:
    """Twin of q_copurchase: distinct membership, basket-size cap,
    container self-join pairs, mirrored per-entity rank."""
    return (
        "WITH mb AS (SELECT DISTINCT l_partkey AS entity, l_orderkey AS "
        "container FROM lineitem), "
        "sz AS (SELECT container, COUNT(*) AS n FROM mb GROUP BY 1), "
        f"mc AS (SELECT mb.entity, mb.container FROM mb JOIN sz "
        f"ON mb.container = sz.container WHERE sz.n <= {cap}), "
        "pr AS (SELECT l.entity AS a, r.entity AS b FROM mc l JOIN mc r "
        "ON l.container = r.container WHERE l.entity < r.entity), "
        "ct AS (SELECT a, b, COUNT(*) AS n_shared FROM pr GROUP BY 1, 2), "
        "mr AS (SELECT a AS id, b AS candidate, n_shared FROM ct "
        "UNION ALL SELECT b AS id, a AS candidate, n_shared FROM ct), "
        "r AS (SELECT id, candidate, n_shared, ROW_NUMBER() OVER "
        "(PARTITION BY id ORDER BY n_shared DESC, candidate ASC) AS rank FROM mr) "
        f"SELECT id, candidate, n_shared, rank::BIGINT AS rank FROM r "
        f"WHERE rank <= {k}"
    )


def _pack_sql(capacity: int) -> str:
    """Twin of q_pack_sequences: the same (md5(doc_id), doc_id) order,
    exclusive running token sum, and integer chop arithmetic — expressed
    as one window cumsum (the oracle can afford the global-order window
    the engine's two-phase prefix sum exists to avoid)."""
    return (
        "WITH t AS (SELECT doc_id, n_chars AS tokens, "
        "md5(CAST(doc_id AS VARCHAR)) AS h FROM documents WHERE n_chars > 0), "
        "c AS (SELECT doc_id, tokens, COALESCE(SUM(tokens) OVER "
        "(ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
        "0) AS st FROM t) "
        "SELECT doc_id, CAST(st AS BIGINT) AS start_token, "
        f"CAST(st // {capacity} AS BIGINT) AS first_seq, "
        f"CAST((st + tokens - 1) // {capacity} AS BIGINT) AS last_seq, "
        f"CAST((st + tokens - 1) // {capacity} - st // {capacity} + 1 AS BIGINT) "
        "AS n_seqs FROM c"
    )


def _betweenness_sql(pivots: int, hops: int) -> str:
    """Twin of q_betweenness: Brandes forward (σ path counts by BFS
    layer) and backward (δ dependency accumulation) unrolled per layer —
    the same recurrence as operators/betweenness.py, expressed as
    chained CTEs."""
    parts = [
        _E,
        _U,
        f"pvt AS (SELECT l_orderkey AS pv FROM (SELECT DISTINCT l_orderkey "
        f"FROM lineitem ORDER BY 1 LIMIT {pivots}))",
        "s0 AS (SELECT pv AS id, pv, CAST(1 AS BIGINT) AS sigma FROM pvt)",
        "acc0 AS (SELECT id, pv FROM s0)",
    ]
    for h in range(1, hops + 1):
        parts += [
            f"cand{h} AS (SELECT u.dst AS id, f.pv, SUM(f.sigma) AS sigma "
            f"FROM s{h - 1} f JOIN u ON f.id = u.src GROUP BY 1, 2)",
            f"s{h} AS (SELECT c.id, c.pv, CAST(c.sigma AS BIGINT) AS sigma "
            f"FROM cand{h} c LEFT JOIN acc{h - 1} a ON c.id = a.id "
            f"AND c.pv = a.pv WHERE a.id IS NULL)",
            f"acc{h} AS (SELECT id, pv FROM acc{h - 1} "
            f"UNION ALL SELECT id, pv FROM s{h})",
        ]
    parts.append(
        f"fin{hops} AS (SELECT id, pv, sigma, 0.0 AS delta FROM s{hops})"
    )
    for h in range(hops, 0, -1):
        parts.append(
            f"del{h - 1} AS (SELECT p.id, p.pv, "
            f"SUM(CAST(p.sigma AS DOUBLE) / CAST(f.sigma AS DOUBLE) "
            f"* (1.0 + f.delta)) AS delta "
            f"FROM fin{h} f JOIN u ON f.id = u.dst "
            f"JOIN s{h - 1} p ON p.id = u.src AND p.pv = f.pv GROUP BY 1, 2)"
        )
        if h > 1:
            parts.append(
                f"fin{h - 1} AS (SELECT l.id, l.pv, l.sigma, "
                f"COALESCE(d.delta, 0.0) AS delta FROM s{h - 1} l "
                f"LEFT JOIN del{h - 1} d ON l.id = d.id AND l.pv = d.pv)"
            )
    union = " UNION ALL ".join(
        f"SELECT id, pv, delta FROM fin{h}" for h in range(1, hops + 1)
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f", pp AS ({union}) "
        "SELECT id, ROUND(SUM(delta), 6) AS betweenness FROM pp "
        "WHERE id <> pv GROUP BY id HAVING ROUND(SUM(delta), 6) > 0"
    )


def _partition_quality_sql(cc_iters: int, parts_n: int) -> str:
    """Twin of q_partition_quality: the cc chain for community labels,
    then per-strategy edge-cut and balance from exact integer counts."""
    chain = [_E, _U, _V, "s0 AS (SELECT id, id AS val FROM v)"]
    for k in range(1, cc_iters + 1):
        p = f"s{k - 1}"
        chain += [
            f"m{k} AS (SELECT u.dst AS id, MIN(p.val) AS mv FROM {p} p "
            f"JOIN u ON p.id = u.src GROUP BY u.dst)",
            f"s{k} AS (SELECT {p}.id, LEAST({p}.val, COALESCE(m{k}.mv, {p}.val)) "
            f"AS val FROM {p} LEFT JOIN m{k} ON {p}.id = m{k}.id)",
        ]
    return (
        "WITH "
        + ", ".join(chain)
        + f", comp AS (SELECT id, CAST(val AS BIGINT) AS component FROM s{cc_iters}), "
        f"asn AS (SELECT 'mod' AS strategy, id, id % {parts_n} AS part FROM comp "
        f"UNION ALL SELECT 'community', id, component % {parts_n} FROM comp), "
        "cut AS (SELECT a1.strategy, COUNT(*) AS ne, "
        "SUM(CASE WHEN a1.part <> a2.part THEN 1 ELSE 0 END) AS nc "
        "FROM u JOIN asn a1 ON u.src = a1.id "
        "JOIN asn a2 ON u.dst = a2.id AND a2.strategy = a1.strategy GROUP BY 1), "
        "sz AS (SELECT strategy, part, COUNT(*) AS s FROM asn GROUP BY 1, 2), "
        "bal AS (SELECT strategy, MAX(s) AS mx, SUM(s) AS nv FROM sz GROUP BY 1) "
        "SELECT cut.strategy, ROUND(nc::DOUBLE / ne::DOUBLE, 6) AS cut_frac, "
        f"ROUND(mx::DOUBLE / (nv::DOUBLE / {float(parts_n)!r}), 6) AS balance "
        "FROM cut JOIN bal ON cut.strategy = bal.strategy"
    )


def _inc_pagerank_sql(
    prior_iters: int, iters: int, damping: float = 0.85
) -> str:
    """Twin of q_incremental_pagerank: the _pagerank_sql recurrence run
    first over the even-dst subgraph (its own N, degrees, dangling
    mass), then over the full graph seeded from the subgraph ranks
    (missing vertices at 1/N_full)."""
    parts = [
        _E,
        _V,
        "ea AS (SELECT src, dst FROM e WHERE dst % 2 = 0)",
        "va AS (SELECT src AS id FROM ea UNION SELECT dst AS id FROM ea)",
        "dega AS (SELECT src, COUNT(*) AS outdeg FROM ea GROUP BY src)",
        "nna AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM va)",
        "a0 AS (SELECT id, 1.0 / (SELECT n FROM nna) AS r FROM va)",
    ]
    for k in range(1, prior_iters + 1):
        p = f"a{k - 1}"
        parts += [
            f"da{k} AS (SELECT COALESCE(SUM(p.r), 0) AS dm FROM {p} p "
            f"LEFT JOIN dega ON p.id = dega.src WHERE dega.src IS NULL)",
            f"ma{k} AS (SELECT ea.dst AS id, SUM(p.r / dega.outdeg) AS s "
            f"FROM {p} p JOIN ea ON p.id = ea.src "
            f"JOIN dega ON dega.src = ea.src GROUP BY ea.dst)",
            f"a{k} AS (SELECT va.id, (1 - {damping}) / (SELECT n FROM nna) + "
            f"{damping} * (COALESCE(ma{k}.s, 0) + (SELECT dm FROM da{k}) / "
            f"(SELECT n FROM nna)) AS r FROM va LEFT JOIN ma{k} ON va.id = ma{k}.id)",
        ]
    parts += [
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v)",
        f"s0 AS (SELECT v.id, COALESCE(a{prior_iters}.r, 1.0 / (SELECT n FROM nn)) "
        f"AS r FROM v LEFT JOIN a{prior_iters} ON v.id = a{prior_iters}.id)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts += [
            f"d{k} AS (SELECT COALESCE(SUM(p.r), 0) AS dm FROM {p} p "
            f"LEFT JOIN deg ON p.id = deg.src WHERE deg.src IS NULL)",
            f"m{k} AS (SELECT e.dst AS id, SUM(p.r / deg.outdeg) AS s "
            f"FROM {p} p JOIN e ON p.id = e.src JOIN deg ON deg.src = e.src "
            f"GROUP BY e.dst)",
            f"s{k} AS (SELECT v.id, (1 - {damping}) / (SELECT n FROM nn) + "
            f"{damping} * (COALESCE(m{k}.s, 0) + (SELECT dm FROM d{k}) / "
            f"(SELECT n FROM nn)) AS r FROM v LEFT JOIN m{k} ON v.id = m{k}.id)",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(ROUND(r, 6) AS DOUBLE) AS rank FROM s{iters}"
    )


def _ktruss_sql(k: int, rounds: int) -> str:
    """Twin of q_ktruss: the triangle-support / edge-peel recurrence
    unrolled over the co-purchase edge table."""
    parts = [
        "li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)",
        "pp0 AS (SELECT a.p AS src, b.p AS dst FROM li a JOIN li b "
        "ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING COUNT(*) >= 2)",
    ]
    for r in range(1, rounds + 1):
        p = f"pp{r - 1}"
        parts += [
            f"tri{r} AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c "
            f"FROM {p} e1 JOIN {p} e2 ON e1.dst = e2.src "
            f"JOIN {p} e3 ON e3.src = e1.src AND e3.dst = e2.dst)",
            f"sup{r} AS (SELECT src, dst, COUNT(*) AS support FROM "
            f"(SELECT a AS src, b AS dst FROM tri{r} "
            f"UNION ALL SELECT b, c FROM tri{r} "
            f"UNION ALL SELECT a, c FROM tri{r}) GROUP BY 1, 2)",
            f"pp{r} AS (SELECT src, dst FROM sup{r} WHERE support >= {k - 2})",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT src, dst, CAST(support AS BIGINT) AS support "
        f"FROM sup{rounds} WHERE support >= {k - 2}"
    )


def _hop_dist_sql(pivots: int, hops: int) -> str:
    """Twin of q_hop_distribution: the _harmonic_sql BFS chain, then a
    per-distance histogram with a running cumulative fraction."""
    parts = [
        _E,
        _U,
        f"pvt AS (SELECT l_orderkey AS pv FROM (SELECT DISTINCT l_orderkey "
        f"FROM lineitem ORDER BY 1 LIMIT {pivots}))",
        "d0 AS (SELECT pv AS id, pv, 0 AS dist FROM pvt)",
        "fr0 AS (SELECT id, pv, dist FROM d0)",
    ]
    for h in range(1, hops + 1):
        parts += [
            f"rh{h} AS (SELECT DISTINCT u.dst AS id, f.pv, {h} AS dist "
            f"FROM fr{h - 1} f JOIN u ON f.id = u.src)",
            f"fr{h} AS (SELECT r.id, r.pv, r.dist FROM rh{h} r "
            f"LEFT JOIN d{h - 1} d ON r.id = d.id AND r.pv = d.pv "
            f"WHERE d.id IS NULL)",
            f"d{h} AS (SELECT * FROM d{h - 1} UNION ALL SELECT * FROM fr{h})",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f", hst AS (SELECT dist, COUNT(*) AS n_pairs FROM d{hops} GROUP BY 1), "
        f"tt AS (SELECT COUNT(*)::DOUBLE AS n FROM d{hops}) "
        "SELECT CAST(dist AS BIGINT) AS dist, n_pairs, "
        "ROUND((SUM(n_pairs) OVER (ORDER BY dist ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW))::DOUBLE / (SELECT n FROM tt), 6) "
        "AS cum_frac FROM hst"
    )


def _bm25_sql(terms: tuple[str, ...], k: int, k1: float, b: float) -> str:
    """Twin of q_bm25: same tokenization as _tfidf_sql, Lucene-style
    idf, identical float-literal constants (Python reprs) and operation
    order; avgdl is the single exact SUM/COUNT division."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) "
        "AS term FROM documents), "
        "tk AS (SELECT doc_id, term FROM tok WHERE term <> ''), "
        "dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY 1), "
        "nn AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS s FROM dl), "
        f"tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk "
        f"WHERE term IN ({tl}) GROUP BY 1, 2), "
        "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), "
        "co AS (SELECT tf.doc_id, "
        "ln(1.0 + (nn.n - df.df + 0.5) / (df.df + 0.5)) * "
        f"(tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * ({1.0 - b!r} + "
        f"{b!r} * dl.dl / (nn.s / nn.n))) AS c "
        "FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN nn), "
        "sc AS (SELECT doc_id, ROUND(SUM(c), 6) AS score FROM co GROUP BY 1) "
        f"SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def _label_spread_sql(rounds: int) -> str:
    """Twin of q_label_spread: the fixed-seed mode-adoption recurrence
    unrolled — the _lpa_sql vote/rank pattern with a CASE pinning seeds
    and NULL-labeled vertices casting no votes."""
    parts = [
        _E,
        _U,
        _V,
        "seeds AS (SELECT CAST(o_orderkey AS BIGINT) AS id, "
        "CAST(c_nationkey AS BIGINT) AS lbl FROM orders "
        "JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 10 = 0)",
        "s0 AS (SELECT v.id, seeds.lbl, seeds.lbl IS NOT NULL AS seed "
        "FROM v LEFT JOIN seeds ON v.id = seeds.id)",
    ]
    for k in range(1, rounds + 1):
        p = f"s{k - 1}"
        parts += [
            f"c{k} AS (SELECT u.dst AS id, p.lbl, COUNT(*) AS cnt FROM {p} p "
            f"JOIN u ON p.id = u.src WHERE p.lbl IS NOT NULL GROUP BY 1, 2)",
            f"t{k} AS (SELECT id, lbl, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY cnt DESC, lbl ASC) AS rn FROM c{k})",
            f"s{k} AS (SELECT p.id, CASE WHEN p.seed THEN p.lbl "
            f"ELSE COALESCE(t.lbl, p.lbl) END AS lbl, p.seed FROM {p} p "
            f"LEFT JOIN (SELECT id, lbl FROM t{k} WHERE rn = 1) t "
            f"ON p.id = t.id)",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, CAST(lbl AS BIGINT) AS label FROM s{rounds} "
        "WHERE lbl IS NOT NULL"
    )


_CHAR_ENTROPY_SQL = (
    "WITH ch AS (SELECT doc_id, length(text) AS n_chars, "
    "substr(text, CAST(unnest(generate_series(1, length(text))) AS INT), 1) AS c "
    "FROM documents WHERE length(text) > 0), "
    "cc AS (SELECT doc_id, n_chars, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2, 3) "
    "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
    "ROUND((ln(CAST(n_chars AS DOUBLE)) - SUM(CAST(cnt AS DOUBLE) * "
    "ln(CAST(cnt AS DOUBLE))) / CAST(n_chars AS DOUBLE)) / "
    f"{math.log(2.0)!r}, 6) AS entropy_bits "
    "FROM cc GROUP BY doc_id, n_chars"
)


def _square_count_sql(cap: int) -> str:
    """Twin of q_square_count: capped wedge pairs, C(c,2) per pair,
    halved for the two diagonals of each square."""
    return (
        f"WITH {_E}, {_U}, "
        "deg AS (SELECT src, COUNT(*) AS d FROM u GROUP BY 1), "
        f"em AS (SELECT u.src, u.dst FROM u JOIN deg ON u.src = deg.src "
        f"WHERE deg.d <= {cap}), "
        "pr AS (SELECT l.dst AS a, r.dst AS b FROM em l JOIN em r "
        "ON l.src = r.src WHERE l.dst < r.dst), "
        "cm AS (SELECT a, b, COUNT(*) AS c FROM pr GROUP BY 1, 2) "
        "SELECT CAST(SUM(c * (c - 1) / 2) / 2 AS BIGINT) AS n_squares, "
        f"CAST((SELECT COUNT(*) FROM deg WHERE d > {cap}) AS BIGINT) "
        "AS excluded_middles FROM cm"
    )


def _weighted_sample_sql(k: int) -> str:
    """Twin of q_weighted_sample: same hash48 dyadic uniform, same
    -ln(u)/w key rounded to 9dp, same (skey, doc_id) cut order."""
    h = "md5('wsample|' || CAST(doc_id AS VARCHAR))"
    return (
        f"WITH t AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS w, "
        f"{_hash48_sql(h)} AS hv FROM documents WHERE n_chars > 0), "
        "s AS (SELECT doc_id, w AS weight, "
        f"ROUND(-ln((hv + 1) / {float(16 ** 12)!r}) / w, 9) AS skey FROM t) "
        f"SELECT doc_id, weight, skey FROM s ORDER BY skey, doc_id LIMIT {k}"
    )


def _hll_sql() -> str:
    """Twin of q_hll_shingles: identical md5 bucket/zero-run register
    construction and estimator arithmetic (the ALPHA·m² literal is the
    repr of the very double Spark inlines, so both engines divide the
    same numbers)."""
    from pregel_golang_implementation_spark.operators.sketches import _ALPHA, _M

    def hexint(start: int, nchars: int) -> str:
        return " + ".join(
            f"(strpos('0123456789abcdef', substr(h, {start + t}, 1)) - 1) "
            f"* {16 ** (nchars - 1 - t)}"
            for t in range(nchars)
        )

    am2 = repr(_ALPHA * _M * _M)
    return (
        f"WITH {_SHINGLES}, "
        "hh AS (SELECT md5(shingle) AS h FROM sh), "
        f"bx AS (SELECT CAST({hexint(1, 2)} AS INT) AS bucket, "
        f"CAST({hexint(3, 13)} AS BIGINT) AS x FROM hh), "
        "r AS (SELECT bucket, MAX(53 - length(regexp_replace(bin(x), '^0+', ''))) "
        "AS m_reg FROM bx GROUP BY 1), "
        "a AS (SELECT COUNT(*) AS present, SUM(POWER(2.0, -m_reg)) AS s_present "
        "FROM r) "
        f"SELECT CAST({_M} AS BIGINT) AS m, CAST(present AS BIGINT) AS "
        "registers_used, ROUND(CASE WHEN "
        f"{am2} / (s_present + ({_M} - present)) <= {2.5 * _M!r} "
        f"AND ({_M} - present) > 0 "
        f"THEN {float(_M)!r} * ln({float(_M)!r} / CAST({_M} - present AS DOUBLE)) "
        f"ELSE {am2} / (s_present + ({_M} - present)) END, 4) AS estimate FROM a"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank_5iter": _pagerank_sql(PR_ITERS),
        # salting is an execution strategy, not a semantics change — the
        # salted run must hash-match the plain unsalted recurrence
        "pagerank_salted": _pagerank_sql(PR_ITERS),
        "cc_6iter": _cc_sql(CC_ITERS),
        # resume(2 + 4 steps) must equal the uninterrupted 6-step run —
        # the oracle is literally the same 6-iteration chain
        "checkpoint_resume": _cc_sql(CC_ITERS),
        "component_sizes": (
            "SELECT component, CAST(COUNT(*) AS BIGINT) AS n_vertices "
            f"FROM ({_cc_sql(CC_ITERS)}) GROUP BY 1"
        ),
        "degree_histogram": (
            f"WITH {_E}, "
            "od AS (SELECT src AS id, COUNT(*) AS out_deg FROM e GROUP BY 1), "
            "id_ AS (SELECT dst AS id, COUNT(*) AS in_deg FROM e GROUP BY 1), "
            "deg AS (SELECT COALESCE(out_deg, 0) + COALESCE(in_deg, 0) AS degree "
            "FROM od FULL OUTER JOIN id_ ON od.id = id_.id) "
            "SELECT CAST(degree AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_vertices "
            "FROM deg GROUP BY 1"
        ),
        "incremental_cc": _incremental_cc_sql(INC_CC_PRIOR_ITERS, INC_CC_ITERS),
        "sssp_4iter": _sssp_sql(SSSP_ITERS),
        "lpa_2iter": _lpa_sql(LPA_ITERS),
        "lpa_4iter": _lpa_sql(LPA4_ITERS),
        "scatter_combine_min": (
            f"WITH {_E} SELECT dst AS id, MIN(src + weight) AS msg, "
            "COUNT(*) AS n_msgs FROM e GROUP BY dst"
        ),
        "vertex_degrees": (
            f"WITH {_E}, "
            "od AS (SELECT src AS id, COUNT(*) AS out_deg FROM e GROUP BY 1), "
            "id_ AS (SELECT dst AS id, COUNT(*) AS in_deg FROM e GROUP BY 1) "
            "SELECT COALESCE(od.id, id_.id) AS id, COALESCE(out_deg, 0) AS out_deg, "
            "COALESCE(in_deg, 0) AS in_deg FROM od FULL OUTER JOIN id_ ON od.id = id_.id"
        ),
        "frontier_after_2": _CC2_ACTIVE_SQL,
        "triangle_count": (
            "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
            "pp AS (SELECT a.p AS src, b.p AS dst FROM li a JOIN li b ON a.o = b.o AND a.p < b.p "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2) "
            "SELECT COUNT(*) AS n_triangles FROM pp e1 "
            "JOIN pp e2 ON e1.dst = e2.src JOIN pp e3 ON e3.src = e1.src AND e3.dst = e2.dst"
        ),
        "triangles_per_vertex": (
            "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
            "pp AS (SELECT a.p AS src, b.p AS dst FROM li a JOIN li b ON a.o = b.o AND a.p < b.p "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
            "tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM pp e1 "
            "JOIN pp e2 ON e1.dst = e2.src JOIN pp e3 ON e3.src = e1.src AND e3.dst = e2.dst) "
            "SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles FROM "
            "(SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) "
            "GROUP BY 1"
        ),
        "kcore_peel_3": _kcore_sql(KCORE_K, KCORE_ROUNDS),
        "dedup_exact": (
            "SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, "
            "MIN(doc_id) AS canonical_id FROM documents GROUP BY 1"
        ),
        "minhash_signatures": (
            f"WITH {_MINHASH} SELECT doc_id, seed AS seed, minhash FROM sig"
        ),
        "lsh_candidate_pairs": (
            f"WITH {_BANDS} SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key "
            "AND a.doc_id < b.doc_id"
        ),
        "ngram_jaccard": (
            f"WITH {_SHINGLES}, "
            "sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter "
            "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS DOUBLE) AS jaccard "
            "FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id "
            "WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.05"
        ),
        "simhash16": _SIMHASH16_SQL,
        # brute-force n² Hamming join — the banded Spark plan must return
        # the identical pair set (pigeonhole recall proof under the hash)
        "simhash_near_dups": (
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
            f"FROM ({_SIMHASH16_SQL}) a JOIN ({_SIMHASH16_SQL}) b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "token_stats": (
            "SELECT doc_id, "
            "len(regexp_split_to_array(trim(lower(text)), '\\s+'))::BIGINT AS n_tokens, "
            "len(regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+'))::BIGINT AS n_subtokens, "
            "length(text)::BIGINT AS n_chars, "
            "octet_length(encode(text))::BIGINT AS n_bytes FROM documents"
        ),
        "quality_score": _quality_sql(),
        "lang_id": _lang_id_sql(),
        "doc_fingerprint": (
            "WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm FROM documents) "
            "SELECT doc_id, md5(norm) AS fp_norm, "
            "list_aggregate([md5(substr(norm, i, 8)) for i in "
            "generate_series(1, greatest(length(norm) - 7, 1))], 'min') AS fp_min_shingle FROM n"
        ),
        "embedding_knn": _knn_sql(),
        "srp_buckets": _srp_sql(),
        "jaccard_candidates": (
            f"WITH {_BANDS}, {_CAND}, {_VERIFY} "
            "SELECT doc_a, doc_b, CAST(ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS DOUBLE) AS jaccard "
            "FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id"
        ),
        "dedup_resolve": _dedup_resolve_sql(RESOLVE_ITERS, RESOLVE_THRESHOLD),
        "ann_candidates": (
            "WITH bk AS (" + _srp_sql() + ") "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM bk a "
            "JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
        ),
        "ann_topk": _ann_topk_sql(),
        "ivf_topk": _ivf_topk_sql(),
        "knn_graph": _knn_graph_sql(),
        "embedding_near_dups": _embedding_near_dups_sql(threshold=0.2),
        "decontaminate": (
            f"WITH {_SHINGLES}, "
            f"b AS (SELECT doc_id AS benchmark_id, shingle FROM sh WHERE doc_id < {DECONTAM_BENCH_MAX_ID}), "
            f"c AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {DECONTAM_BENCH_MAX_ID}), "
            "sizes AS (SELECT benchmark_id, COUNT(*) AS n_bench FROM b GROUP BY 1), "
            "inter AS (SELECT c.doc_id, b.benchmark_id, COUNT(*) AS n_inter "
            "FROM c JOIN b ON c.shingle = b.shingle GROUP BY 1, 2) "
            "SELECT i.doc_id, i.benchmark_id, "
            "CAST(ROUND(n_inter / n_bench, 6) AS DOUBLE) AS containment "
            "FROM inter i JOIN sizes s ON i.benchmark_id = s.benchmark_id"
        ),
        "hash_sample": (
            "SELECT doc_id, lang, source FROM documents "
            f"WHERE substr(md5('sample|' || doc_id::VARCHAR), 1, 4) < '{_hex_thr(SAMPLE_FRACTION)}'"
        ),
        "corpus_mix": _corpus_mix_sql(),
        "event_window_stats": (
            "SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start, "
            "event_type, COUNT(*) AS n, "
            # decimal(38,9) sum = order-independent (exact decimal addition
            # after one deterministic per-value rounding) — mirrors the
            # engine's _decimal_sum so partition order can never flip the
            # 6th decimal of the hash-compared total
            "CAST(ROUND(SUM(CAST(value AS DECIMAL(38,9))), 6) AS DOUBLE) AS total_value, "
            # TRY_CAST(NULLIF(...)): DuckDB regexp_extract yields '' for a
            # non-matching props string and CAST('' AS BIGINT) hard-errors,
            # whereas Spark yields NULL and avg() skips it — the twin must
            # skip too, or any event without a "k" property kills the oracle.
            "CAST(ROUND(AVG(TRY_CAST(NULLIF(regexp_extract(props, '\"k\":\\s*(\\d+)', 1), '') AS BIGINT)), 6) AS DOUBLE) AS avg_k "
            "FROM events GROUP BY 1, 2"
        ),
        "sessionize": (
            "WITH ev AS (SELECT user_id, event_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS ep, value FROM events), "
            "f AS (SELECT user_id, event_id, ep, value, "
            "CASE WHEN LAG(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) IS NULL "
            "OR ep - LAG(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) > 1800 "
            "THEN 1 ELSE 0 END AS nw FROM ev), "
            "g AS (SELECT user_id, ep, value, SUM(nw) OVER (PARTITION BY user_id "
            "ORDER BY ep, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM f) "
            # CAST: DuckDB's windowed SUM yields HUGEINT, which pandas
            # renders as float64 (1.0) while Spark emits long (1) — the
            # driver's exact value hash sees those as different even when
            # every value matches. Same rule as every other integer column
            # in this file: cast in the twin.
            "SELECT user_id, CAST(sess AS BIGINT) AS session_no, COUNT(*) AS n_events, "
            "MIN(ep) AS start_ts, MAX(ep) AS end_ts, "
            "CAST(ROUND(SUM(CAST(value AS DECIMAL(38,9))), 6) AS DOUBLE) AS total_value "
            "FROM g GROUP BY 1, 2"
        ),
        "pagerank_top10": (
            "SELECT * FROM ("
            + _pagerank_sql(PR_ITERS)
            + ") ORDER BY rank DESC, id ASC LIMIT 10"
        ),
        "personalized_pagerank": _ppr_sql(PR_ITERS),
        "pagerank_weighted": _pagerank_sql(PR_ITERS, weighted=True),
        "tfidf_top3": _tfidf_sql(TFIDF_K),
        "top_bigrams": _top_bigrams_sql(TOP_NGRAMS_K),
        "text_normalize": _text_normalize_sql(),
        "stratified_sample": _stratified_sample_sql(),
        "event_funnel": _funnel_sql(FUNNEL_STEPS),
        "assortativity": _assortativity_sql(),
        "pq_codes": _pq_codes_sql(PQ_M, PQ_KSUB, EMB_DIM),
        "mis_4iter": _materialize(_mis_sql(MIS_ITERS)),
        "link_predict": _materialize(_link_predict_sql(LP_K, LP_MAX_MID_DEG)),
        "repeated_spans": _repeated_spans_sql(SPAN_N, SPAN_MIN_DOCS),
        "last_touch": _last_touch_sql(),
        "hits_3iter": _materialize(_hits_sql(HITS_ITERS)),
        "greedy_coloring": _materialize(_coloring_sql(COLOR_ROUNDS, COLOR_INNER)),
        "quantiles_exact": _quantiles_sql(QUANTILE_QS),
        "random_walks": _materialize(_walks_sql(WALK_LEN)),
        "temporal_reach": _materialize(_temporal_sql(TEMPORAL_ITERS)),
        "scc_fwbw": _materialize(_scc_sql(SCC_INNER, SCC_TRIM)),
        "kmeans_2iter": _materialize(_kmeans_sql(KMEANS_K, KMEANS_ITERS)),
        "revenue_rollup": _ROLLUP_SQL,
        "docs_cube": _DOCS_CUBE_SQL,
        "adamic_adar": _materialize(_adamic_adar_sql(LP_K, LP_MAX_MID_DEG)),
        "harmonic_4src": _materialize(
            _harmonic_sql(HARMONIC_PIVOTS, HARMONIC_HOPS)
        ),
        "copurchase_topk": _materialize(
            _copurchase_sql(LP_K, COPURCHASE_MAX_BASKET)
        ),
        "pack_sequences": _pack_sql(PACK_CAPACITY),
        "quality_p90_cut": _materialize(_quality_p90_sql(QUALITY_CUT_Q)),
        "betweenness_2src": _materialize(
            _betweenness_sql(BETWEEN_PIVOTS, BETWEEN_HOPS)
        ),
        "hll_shingles": _materialize(_hll_sql()),
        "weighted_sample": _weighted_sample_sql(WSAMPLE_K),
        "square_count": _materialize(_square_count_sql(LP_MAX_MID_DEG)),
        "char_entropy": _CHAR_ENTROPY_SQL,
        "label_spread": _materialize(_label_spread_sql(SPREAD_ROUNDS)),
        "bm25_topk": _materialize(_bm25_sql(BM25_TERMS, BM25_K, BM25_K1, BM25_B)),
        "hop_distribution": _materialize(
            _hop_dist_sql(HARMONIC_PIVOTS, HARMONIC_HOPS)
        ),
        "ktruss_3": _materialize(_ktruss_sql(KTRUSS_K, KTRUSS_ROUNDS)),
        "incremental_pagerank": _materialize(
            _inc_pagerank_sql(INC_PR_PRIOR_ITERS, INC_PR_ITERS)
        ),
        "partition_quality": _materialize(
            _partition_quality_sql(CC_ITERS, PQUAL_PARTS)
        ),
        "powerlaw_alpha": (
            f"WITH {_E}, {_U}, "
            "deg AS (SELECT src AS id, COUNT(*) AS d FROM u GROUP BY 1), "
            f"tail AS (SELECT d FROM deg WHERE d >= {PL_DMIN}) "
            "SELECT COUNT(*) AS n_tail, "
            f"CAST({PL_DMIN} AS BIGINT) AS d_min, "
            f"ROUND(1.0 + COUNT(*) / SUM(ln(CAST(d AS DOUBLE) / {PL_DMIN - 0.5!r})), 6) "
            "AS alpha FROM tail"
        ),
        "clustering_coeff": _materialize(
            "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
            "pp AS (SELECT a.p AS src, b.p AS dst FROM li a JOIN li b ON a.o = b.o AND a.p < b.p "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
            "tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM pp e1 "
            "JOIN pp e2 ON e1.dst = e2.src JOIN pp e3 ON e3.src = e1.src AND e3.dst = e2.dst), "
            "tpv AS (SELECT id, COUNT(*) AS t FROM (SELECT a AS id FROM tri "
            "UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) GROUP BY 1), "
            "deg AS (SELECT id, COUNT(*) AS degree FROM (SELECT src AS id FROM pp "
            "UNION ALL SELECT dst FROM pp) GROUP BY 1) "
            "SELECT deg.id, CAST(deg.degree AS BIGINT) AS degree, "
            "ROUND(2.0 * CAST(COALESCE(tpv.t, 0) AS DOUBLE) / "
            "CAST(deg.degree * (deg.degree - 1) AS DOUBLE), 6) AS coeff "
            "FROM deg LEFT JOIN tpv ON deg.id = tpv.id WHERE deg.degree >= 2"
        ),
    }


def _hex_thr(fraction: float) -> str:
    from pregel_golang_implementation_spark.operators.sampling import _hex_threshold

    return _hex_threshold(fraction)


def _corpus_mix_sql() -> str:
    cases = " ".join(
        f"WHEN '{v}' THEN {m}" for v, m in sorted(MIX_MULTIPLIERS.items())
    )
    return (
        f"WITH m AS (SELECT doc_id, source, CASE source {cases} ELSE 1.0 END AS mult "
        "FROM documents), "
        "c AS (SELECT doc_id, source, CAST(floor(mult) AS INT) + "
        "CASE WHEN substr(md5('mix|' || doc_id::VARCHAR), 1, 4) < "
        "printf('%04x', CAST(floor((mult - floor(mult)) * 65536) AS BIGINT)) "
        "THEN 1 ELSE 0 END AS n FROM m) "
        "SELECT doc_id, source, unnest(generate_series(0, n - 1)) AS copy_no "
        "FROM c WHERE n > 0"
    )


def _embedding_near_dups_sql(threshold: float) -> str:
    dot = "list_aggregate([va[i]::DOUBLE * vb[i]::DOUBLE for i in generate_series(1, len(va))], 'sum')"
    na = "sqrt(list_aggregate([va[i]::DOUBLE * va[i]::DOUBLE for i in generate_series(1, len(va))], 'sum'))"
    nb = "sqrt(list_aggregate([vb[i]::DOUBLE * vb[i]::DOUBLE for i in generate_series(1, len(vb))], 'sum'))"
    return (
        "WITH bk AS (" + _srp_sql() + "), "
        "cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM bk a "
        "JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id), "
        "pairs AS (SELECT vec_a, vec_b, ea.embedding AS va, eb.embedding AS vb "
        "FROM cand JOIN embeddings ea ON ea.vec_id = vec_a "
        "JOIN embeddings eb ON eb.vec_id = vec_b), "
        "sim AS (SELECT vec_a, vec_b, "
        f"CAST(ROUND({dot} / ({na} * {nb}), 5) AS DOUBLE) AS sim FROM pairs) "
        f"SELECT vec_a, vec_b, sim FROM sim WHERE sim >= {threshold}"
    )


def _quality_base_sql() -> str:
    """The t→base CTE chain shared by _quality_sql and the P90-threshold
    composition oracle: per-doc stopword/length/alnum/dup-line signals."""
    from pregel_golang_implementation_spark.operators.textstats import LANG_MARKERS

    stop = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in stop)
    return (
        "t AS (SELECT doc_id, text, "
        "regexp_split_to_array(trim(lower(text)), '\\s+') AS w, "
        "list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS ln FROM documents), "
        "base AS (SELECT doc_id, "
        f"CAST(ROUND(len(list_filter(w, x -> x IN ({stop_list}))) / GREATEST(len(w), 1), 6) AS DOUBLE) AS stopword_ratio, "
        "CAST(ROUND(length(regexp_replace(trim(text), '\\s+', '', 'g')) / GREATEST(len(w), 1), 6) AS DOUBLE) AS mean_token_len, "
        "CAST(ROUND(length(regexp_replace(text, '[^\\p{L}\\p{N}]', '', 'g')) / GREATEST(length(text), 1), 6) AS DOUBLE) AS alnum_ratio, "
        "CAST(CASE WHEN len(ln) > 0 THEN ROUND(1.0 - len(list_distinct(ln)) / len(ln), 6) "
        "ELSE 0.0 END AS DOUBLE) AS dup_line_frac "
        "FROM t)"
    )


def _quality_sql() -> str:
    return (
        f"WITH {_quality_base_sql()}, "
        "bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN "
        "[w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)] "
        "ELSE [] END AS bgs FROM t), "
        "bg AS (SELECT doc_id, unnest(bgs) AS bg FROM bgl), "
        "bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2), "
        "tb AS (SELECT doc_id, CAST(ROUND(MAX(c) / SUM(c), 6) AS DOUBLE) AS top_bigram_frac "
        "FROM bc GROUP BY 1) "
        "SELECT base.doc_id, stopword_ratio, mean_token_len, alnum_ratio, dup_line_frac, "
        "CAST(COALESCE(top_bigram_frac, 0.0) AS DOUBLE) AS top_bigram_frac, "
        "CAST(mean_token_len >= 2 AND mean_token_len <= 12 AND alnum_ratio >= 0.5 "
        "AND dup_line_frac <= 0.3 AND COALESCE(top_bigram_frac, 0.0) <= 0.2 AS INT) AS quality "
        "FROM base LEFT JOIN tb ON base.doc_id = tb.doc_id"
    )


def _quality_p90_sql(q: float) -> str:
    """Twin of q_quality_p90: the quality base signals + the type-7
    quantile formula (explicit order statistics, as _quantiles_sql) on
    stopword_ratio, then the ≥-threshold filter — the 'keep documents
    above the corpus P-th percentile' composition the quantile operator
    exists for."""
    return (
        f"WITH {_quality_base_sql()}, "
        "s AS (SELECT stopword_ratio AS v FROM base), "
        "r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM s), "
        "n AS (SELECT COUNT(*) AS n FROM s), "
        f"b AS (SELECT 1.0 + (n.n - 1) * CAST({q!r} AS DOUBLE) AS k FROM n), "
        "g AS (SELECT CAST(FLOOR(k) AS BIGINT) AS lo, CAST(CEIL(k) AS BIGINT) "
        "AS hi, k - FLOOR(k) AS frac FROM b), "
        "thr AS (SELECT ROUND(rlo.v + g.frac * (rhi.v - rlo.v), 6) AS t "
        "FROM g JOIN r rlo ON rlo.rn = g.lo JOIN r rhi ON rhi.rn = g.hi) "
        "SELECT doc_id, stopword_ratio FROM base "
        "WHERE stopword_ratio >= (SELECT t FROM thr)"
    )


def _lang_id_sql() -> str:
    from pregel_golang_implementation_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hits = ", ".join(
        "len(list_filter(w, x -> x IN ({}))) AS h_{}".format(
            ", ".join(f"'{t}'" for t in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    gmax = "GREATEST(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = f"CASE WHEN {gmax} = 0 THEN 'und' "
    for i, lang in enumerate(langs):
        if i < len(langs) - 1:
            conds = " AND ".join(f"h_{lang} >= h_{other}" for other in langs[i + 1 :])
            case += f"WHEN {conds} THEN '{lang}' "
        else:
            case += f"ELSE '{lang}' "
    case += "END"
    return (
        "WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents), "
        f"s AS (SELECT doc_id, {hits} FROM t) "
        f"SELECT doc_id, {case} AS lang_guess, {gmax}::BIGINT AS lang_hits FROM s"
    )


def _knn_sql() -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    dot = "list_aggregate([qv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum')"
    nq = "sqrt(list_aggregate([qv[i]::DOUBLE * qv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum'))"
    nc = "sqrt(list_aggregate([cv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(cv))], 'sum'))"
    return (
        f"WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN ({ids})), "
        "c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings), "
        "scored AS (SELECT query_id, neighbor_id, "
        f"CAST(ROUND({dot} / ({nq} * {nc}), 5) AS DOUBLE) AS sim FROM q, c "
        "WHERE query_id <> neighbor_id), "
        "ranked AS (SELECT query_id, neighbor_id, sim, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, sim, rank::BIGINT AS rank FROM ranked WHERE rank <= {KNN_K}"
    )


def _ann_topk_sql(bits: int = ANN_BITS) -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    dot = "list_aggregate([qv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum')"
    nq = "sqrt(list_aggregate([qv[i]::DOUBLE * qv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum'))"
    nc = "sqrt(list_aggregate([cv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(cv))], 'sum'))"
    return (
        "WITH bk AS (" + _srp_sql(bits) + "), "
        f"q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, bk.bucket "
        f"FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id WHERE e.vec_id IN ({ids})), "
        "c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, bk.bucket "
        "FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id), "
        "scored AS (SELECT query_id, neighbor_id, "
        f"CAST(ROUND({dot} / ({nq} * {nc}), 5) AS DOUBLE) AS sim "
        "FROM q JOIN c ON q.bucket = c.bucket WHERE query_id <> neighbor_id), "
        "ranked AS (SELECT query_id, neighbor_id, sim, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, sim, rank::BIGINT AS rank FROM ranked WHERE rank <= {KNN_K}"
    )


def _knn_graph_sql(bits: int = ANN_BITS, k: int = KNN_GRAPH_K) -> str:
    dot = "list_aggregate([qv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum')"
    nq = "sqrt(list_aggregate([qv[i]::DOUBLE * qv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum'))"
    nc = "sqrt(list_aggregate([cv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(cv))], 'sum'))"
    return (
        "WITH bk AS (" + _srp_sql(bits) + "), "
        "a AS (SELECT e.vec_id AS qid, e.embedding AS qv, bk.bucket "
        "FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id), "
        "b AS (SELECT e.vec_id AS nid, e.embedding AS cv, bk.bucket "
        "FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id), "
        "scored AS (SELECT qid, nid, "
        f"CAST(ROUND({dot} / ({nq} * {nc}), 5) AS DOUBLE) AS sim "
        "FROM a JOIN b ON a.bucket = b.bucket WHERE qid <> nid), "
        "ranked AS (SELECT qid, nid, sim, ROW_NUMBER() OVER "
        "(PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank FROM scored) "
        f"SELECT qid AS vec_id, nid AS neighbor_id, sim, rank::BIGINT AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def _kcore_sql(k: int, rounds: int) -> str:
    """Twin of q_kcore: the peel recurrence unrolled — round r keeps
    vertices whose degree in the subgraph induced by round r-1's
    survivors is ≥ k (same HAVING filter the engine's
    ``kcore_peel`` applies per round)."""
    parts = [
        _E,
        _U,
        f"a1 AS (SELECT src AS id, COUNT(*) AS degree FROM u "
        f"GROUP BY 1 HAVING COUNT(*) >= {k})",
    ]
    for r in range(2, rounds + 1):
        p = f"a{r - 1}"
        parts.append(
            f"a{r} AS (SELECT u.src AS id, COUNT(*) AS degree FROM u "
            f"JOIN {p} s ON u.src = s.id JOIN {p} d ON u.dst = d.id "
            f"GROUP BY 1 HAVING COUNT(*) >= {k})"
        )
    return _materialize(
        "WITH "
        + ", ".join(parts)
        + f" SELECT id, degree::BIGINT AS degree FROM a{rounds}"
    )


def _ivf_topk_sql(c: int = IVF_CENTROIDS, nprobe: int = IVF_NPROBE) -> str:
    """Twin of q_ivf_topk: centroids = the c vectors with smallest
    md5(vec_id) (ties by id); cell = argmax of 6dp-rounded cosine with
    NULL→-2.0 sentinel, ties to the smallest centroid id; queries probe
    their nprobe nearest cells; exact 5dp cosine re-rank within."""
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    dotc = "list_aggregate([ev[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(ev))], 'sum')"
    ne_ = "sqrt(list_aggregate([ev[i]::DOUBLE * ev[i]::DOUBLE for i in generate_series(1, len(ev))], 'sum'))"
    nc_ = "sqrt(list_aggregate([cv[i]::DOUBLE * cv[i]::DOUBLE for i in generate_series(1, len(cv))], 'sum'))"
    dot = "list_aggregate([qv[i]::DOUBLE * nv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum')"
    nq = "sqrt(list_aggregate([qv[i]::DOUBLE * qv[i]::DOUBLE for i in generate_series(1, len(qv))], 'sum'))"
    nn = "sqrt(list_aggregate([nv[i]::DOUBLE * nv[i]::DOUBLE for i in generate_series(1, len(nv))], 'sum'))"
    return (
        "WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cv "
        f"FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {c}), "
        "asgn AS (SELECT e.vec_id, cent.centroid_id, "
        f"COALESCE(ROUND({dotc} / ({ne_} * {nc_}), 6), -2.0) AS csim "
        "FROM (SELECT vec_id, embedding AS ev FROM embeddings) e CROSS JOIN cent), "
        "cellr AS (SELECT vec_id, centroid_id, ROW_NUMBER() OVER "
        "(PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rn FROM asgn), "
        "cells AS (SELECT vec_id, centroid_id AS cell FROM cellr WHERE rn = 1), "
        f"probes AS (SELECT vec_id AS query_id, centroid_id AS cell FROM cellr "
        f"WHERE rn <= {nprobe} AND vec_id IN ({ids})), "
        "scored AS (SELECT p.query_id, s.vec_id AS neighbor_id, "
        f"CAST(ROUND({dot} / ({nq} * {nn}), 5) AS DOUBLE) AS sim "
        "FROM probes p JOIN cells s ON s.cell = p.cell "
        "JOIN (SELECT vec_id, embedding AS qv FROM embeddings) qe ON qe.vec_id = p.query_id "
        "JOIN (SELECT vec_id, embedding AS nv FROM embeddings) nb ON nb.vec_id = s.vec_id "
        "WHERE p.query_id <> s.vec_id), "
        "ranked AS (SELECT query_id, neighbor_id, sim, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, sim, rank::BIGINT AS rank FROM ranked WHERE rank <= {KNN_K}"
    )


def _srp_sql(bits: int = 8) -> str:
    return (
        "WITH d AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings), "
        "dx AS (SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS x FROM d), "
        f"db AS (SELECT vec_id, dim, x, unnest(generate_series(0, {bits - 1})) AS b FROM dx), "
        "proj AS (SELECT vec_id, b, x * (CASE WHEN substr(md5(b::VARCHAR || '_' || dim::VARCHAR), 1, 1) "
        "IN ('0','1','2','3','4','5','6','7') THEN -1.0 ELSE 1.0 END) AS wx FROM db), "
        "s AS (SELECT vec_id, b, ROUND(SUM(wx), 6) AS s FROM proj GROUP BY 1, 2) "
        "SELECT vec_id, CAST(SUM(CASE WHEN s >= 0 THEN POW(2, b) ELSE 0 END) AS BIGINT) AS bucket "
        "FROM s GROUP BY 1"
    )
