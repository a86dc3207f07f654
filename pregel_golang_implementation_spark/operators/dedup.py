"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (it is a graph engine only) — these are the
first-class data-pipeline components the engine owes at 100 TB scale:
exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard.

Design for scale:
  - everything is built-in JVM expressions (md5/xxhash64, explode,
    groupBy) — no Python on the hot path;
  - MinHash uses the "min of md5(seed || shingle)" family: k independent
    permutations approximated by k seeded hashes; string-min is
    deterministic and reproducible in any engine (the DuckDB oracle runs
    the same expressions);
  - a faster xxhash64 variant exists for production scale (hash_fn
    parameter) — same algorithm, cheaper hash, not oracle-mirrorable;
  - LSH banding turns O(n²) near-dup search into per-band hash joins —
    the band groupBy is the only shuffle that matters and it is keyed by
    (band, band_key), which is uniformly distributed by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ------------------------------------------------------------ exact dedup

def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: (content_hash, n_docs, canonical_id).
    canonical = smallest id in the group; groups of 1 included (filter
    n_docs > 1 for the duplicate report)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


# --------------------------------------------------------------- shingles

def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document.  Pure
    higher-order functions (transform over an index sequence) — codegen,
    no UDF."""
    toks = _tokens(text_col)
    shingle_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------- minhash

def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16, hash_fn: str = "md5"
) -> DataFrame:
    """(doc_id, seed, minhash) — k seeded min-hashes per document.

    hash_fn='md5'    : minhash = min(md5(seed || '|' || shingle)) as hex
                       string — oracle-mirrorable (DuckDB md5 identical).
    hash_fn='xxhash' : minhash = min(xxhash64(shingle, seed)) as long —
                       ~10× cheaper, the production path.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    exploded = shingles.select("doc_id", "shingle", seeds)
    if hash_fn == "md5":
        h = F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")))
    elif hash_fn == "xxhash":
        h = F.xxhash64("shingle", "seed").cast("string")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return (
        exploded.select("doc_id", "seed", h.alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_bands(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """(doc_id, band, band_key) — hash each band of the signature.
    band_key = md5 of the ordered minhashes in the band (order by seed →
    deterministic)."""
    banded = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(":", F.lpad(F.col("seed").cast("string"), 4, "0"), F.col("minhash"))
                    )
                ),
                ",",
            )
        ).alias("band_key")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b) distinct — documents sharing ≥1 band bucket.
    Self-join keyed by (band, band_key); doc_a < doc_b."""
    l = bands.select(F.col("band"), F.col("band_key"), F.col("doc_id").alias("doc_a"))
    r = bands.select(F.col("band"), F.col("band_key"), F.col("doc_id").alias("doc_b"))
    return (
        l.join(r, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup(
    docs: DataFrame,
    shingle_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → candidate pairs (doc_a, doc_b)."""
    sh = word_shingles(docs, n=shingle_n)
    sig = minhash_signatures(sh, num_hashes=num_hashes, hash_fn=hash_fn)
    return lsh_candidate_pairs(lsh_bands(sig, rows_per_band=rows_per_band))


# --------------------------------------------------------- n-gram jaccard

def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame | None = None, shingle_n: int = 3, threshold: float = 0.0
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact Jaccard over word n-gram sets.

    Relational formulation (explode → join → count) so the semantics are
    oracle-identical in any SQL engine; when ``pairs`` (candidate pairs
    from LSH) is given, only those pairs are scored — the 100 TB path is
    always LSH-candidates-then-verify, never all-pairs.
    """
    sh = word_shingles(docs, n=shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["doc_a", "doc_b"], "inner")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


# ----------------------------------------------------------------- simhash

def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — per-bit majority vote over token hashes.

    Bit j of token t := 1 if the j-th hex digit of md5(t) ≥ '8' else 0
    (each hex digit's high bit is an independent fair coin).  The document
    bit is the sign of Σ(±1) over tokens.  All string/CASE expressions —
    mirrorable in the DuckDB oracle.  bits ≤ 32 (md5 has 32 hex digits).
    """
    assert bits <= 32
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    j = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    votes = toks.select("doc_id", "h", j).select(
        "doc_id",
        "j",
        F.when(
            F.substring(F.col("h"), F.col("j") + 1, 1).isin(*list("89abcdef")), 1
        ).otherwise(-1).alias("v"),
    )
    bitsum = votes.groupBy("doc_id", "j").agg(F.sum("v").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.pow(F.lit(2.0), F.col("j"))).otherwise(F.lit(0.0))
        ).cast("long").alias("simhash")
    )
