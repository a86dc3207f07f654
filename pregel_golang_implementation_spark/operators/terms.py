"""Term-level corpus analytics: TF-IDF, corpus heavy hitters, text
normalization.

Training-data pipelines rank and filter documents by term statistics
(keyword extraction, boilerplate detection, vocabulary builds).  The
reference engine has no text surface at all — these extend its
aggregation/join/window categories (SURVEY.md §2.2) onto the
``documents`` table, all built-in JVM expressions.

Determinism contract (shared with the cosine/IVF operators): any float
that feeds an ORDER BY is rounded to a fixed number of decimals BEFORE
ranking, and every tie breaks on a total-ordered key, so the DuckDB
oracle reproduces ranks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# one regex, both engines (Java + RE2 agree on this subset)
_TOKEN_SPLIT = "\\s+"


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, term) — one row per token occurrence."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), _TOKEN_SPLIT)).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, term, score, rank) — the ``k`` highest-TF-IDF terms per
    document; score = tf * (ln((N+1)/(df+1)) + 1), smoothed so terms in
    every document still score > 0.

    Scale shape: tf is one groupBy keyed (doc_id, term) — uniform unless
    one document repeats one token billions of times, which the token
    explode already bounds to that document's own length; df is a
    map-side-combinable distinct-count aggregate; N rides in as a
    broadcast 1-row cross join (never ``.collect()`` on the hot path —
    but it is a scalar, so a driver literal would also be fine); the
    per-document top-k window partitions on doc_id, which is uniform by
    construction.  Nothing here is a global sort.
    """
    toks = _tokens(docs, text_col, id_col)
    # tf feeds BOTH the score join and the document-frequency aggregate;
    # exchange reuse does not fire across the two consumers (r6 plan
    # audit: 0 ReusedExchange), so unpinned the corpus would be tokenized
    # and aggregated twice — the lazy pin shares one execution
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", F.col("rank").cast("long").alias("rank"))
    )


def top_ngrams(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(ngram, cnt, rank) — the ``k`` most frequent word bigrams across
    the corpus (heavy hitters: boilerplate phrases, contamination
    signatures).

    Exact counts via one (ngram)-keyed groupBy with map-side combine;
    the final top-k is ``orderBy().limit(k)``, which Spark plans as
    TakeOrderedAndProject — per-partition top-k then a tiny driver-side
    merge, NOT a global sort.  A skewed phrase distribution (Zipf — the
    norm for n-grams) only makes the map-side combine more effective.
    """
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), _TOKEN_SPLIT).alias("_toks"),
    ).withColumn("_toks", F.filter("_toks", lambda t: t != ""))
    grams = toked.select(
        F.explode(
            F.expr(
                "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
                "(t, i) -> concat(t, ' ', _toks[i + 1]))"
            )
        ).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("ngram"))
    # the single-reducer window is fine HERE ONLY because its input is
    # already the top-k of a TakeOrdered — k rows, not the corpus
    topk = counts.orderBy(F.desc("cnt"), F.asc("ngram")).limit(k)
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def normalize_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, norm_hash, n_norm_chars) — canonical text form for exact
    dedup across formatting variants: lowercase, non-alphanumerics to
    spaces, whitespace collapsed, trimmed; the hash (not the text)
    travels downstream, so the wide string column dies in this one
    projection — at 100 TB the normalized text itself is never
    shuffled.  Pure per-row projection: no shuffle, pushdown-friendly.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("n_norm_chars"),
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(span, n_docs, total_occurrences, min_doc_id) — exact n-token
    spans appearing in ≥ ``min_docs`` distinct documents: the detection
    half of exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — their suffix-array
    find-then-cut, restricted to a fixed window length, which turns the
    suffix array into a plain aggregate).

    Scale shape: explode to (span, doc) — corpus token count × 1 rows —
    then one groupBy keyed by the span text.  Span frequencies are Zipf
    (boilerplate dominates), which map-side partial aggregation absorbs:
    each map partition emits one partial per distinct span it saw.  The
    ``min_docs`` filter prunes the long unique tail immediately after
    the aggregate.  At 100 TB the span STRING should be replaced by its
    xxhash64 for the shuffle (8 bytes vs ~40) and rehydrated by joining
    winners back — kept as text here so the oracle compares values.
    """
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), _TOKEN_SPLIT), lambda t: t != "").alias(
            "_toks"
        ),
    )
    spans = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(slice(_toks, 1, greatest(size(_toks) - {n} + 1, 0)), "
                f"(t, i) -> array_join(slice(_toks, i + 1, {n}), ' '))"
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("total_occurrences"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, score) — the ``k`` documents ranking highest under BM25
    for the bag of ``query_terms`` (Robertson et al.; the Lucene-style
    idf = ln(1 + (N−df+0.5)/(df+0.5)), which never goes negative).
    Ranked retrieval is the query surface a corpus engine owes its
    users once TF-IDF features exist.

    N and avgdl are taken over tokenizable documents (≥1 token).  All
    inputs to the floating-point formula are exact integers (tf, df,
    dl, N) or their single exact ratio (avgdl), the per-term
    contributions sum over only |query| values, and the score is
    rounded to ``round_to`` before the (score DESC, doc_id ASC) cut —
    the repo's cross-engine determinism discipline.

    Scale shape (r6: fused to ONE tokenize pass — the previous shape
    tokenized the corpus three times, for avgdl, dl and tf): a single
    per-doc aggregate computes dl AND one conditional-count column per
    query term; the (N, avgdl) scalars, the per-term unpivot and the df
    aggregate all read that pinned V-row frame.  The per-term columns
    bound the width to |query| — fine for retrieval-sized queries; a
    thousand-term query should pre-filter + group instead.  The final
    cut is a distributed TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))
    tk = _tokens(docs, text_col, id_col)
    per_doc = (
        tk.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("term") == F.lit(t)).cast("long")).alias(f"_tf{i}")
                for i in range(len(terms))
                for t in [terms[i]]
            ],
        )
        .localCheckpoint(eager=False)  # one execution for scalars + scoring
    )
    n_row = per_doc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    if not n_row["n"]:
        # ADVICE r5: an untokenizable corpus used to die with
        # ZeroDivisionError computing avgdl — fail with the real reason
        raise ValueError(
            "bm25_topk: corpus has no tokenizable documents (every text "
            "splits to zero tokens) — nothing to rank"
        )
    n_docs, avgdl = int(n_row["n"]), float(n_row["s"]) / int(n_row["n"])
    tf = (
        per_doc.select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"), F.col(f"_tf{i}").alias("tf")
                        )
                        for i, t in enumerate(terms)
                    ]
                )
            ).alias("kv"),
        )
        .select("doc_id", "dl", F.col("kv.term").alias("term"), F.col("kv.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("c"), round_to).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
