"""Text analysis for training-data curation: token stats, quality
scoring, n-gram language ID, document fingerprinting.

All built-in column expressions (split/regexp/aggregate) — JVM-side,
whole-stage codegen; every operator has an exact SQL twin for the
DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language function-word lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "por", "una", "con"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


# BPE-style pre-tokenizer approximation: letter runs, digit runs, and
# punctuation runs are separate tokens (what GPT-2-ish pre-tokenization
# yields before the merges) — RE2/Java-portable so the oracle is exact
BPE_ISH_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_subtokens, n_chars, n_bytes) — whitespace
    tokenization, BPE-ish pre-token count (letter/digit/punct runs), and
    byte length (the multimodal-adjacent 'how big is this really')."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), F.lit(0)))
        .cast("long")
        .alias("n_subtokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, stopword_ratio, mean_token_len, alnum_ratio,
    dup_line_frac, top_bigram_frac, quality) — length/punct/stopword
    heuristics PLUS the Gopher-style repetition signals (the most
    predictive junk filters in practice):

      dup_line_frac   = 1 − distinct non-blank lines / non-blank lines
                        (boilerplate/navigation pages repeat lines)
      top_bigram_frac = occurrences of the most frequent word 2-gram /
                        total word 2-grams (degenerate "spam spam spam…"
                        text → 1.0)

    quality = 1 iff all gates pass: 2 ≤ mean_token_len ≤ 12,
    alnum_ratio ≥ 0.5, dup_line_frac ≤ 0.3, top_bigram_frac ≤ 0.2 (the
    published Gopher thresholds for the last two).

    Shape: the length/char signals are pure projection; the bigram mode
    is an explode + two doc-keyed aggregates (a mode inside an array has
    no builtin), left-joined back — all JVM-side, keys uniform in doc_id.
    """
    all_stop = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    toked = docs.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).alias(text_col),
        _tokens(text_col).alias("_toks"),  # own projection: split runs once
        F.filter(
            F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != ""
        ).alias("_lines"),
    )
    toks = F.col("_toks")
    lines = F.col("_lines")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(all_stop)))
    alnum = F.length(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}]", ""))
    base = toked.select(
        F.col(id_col).alias("doc_id"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
            / F.greatest(n_tok, F.lit(1)),
            6,
        ).alias("mean_token_len"),
        F.round(alnum / F.greatest(F.length(F.col(text_col)), F.lit(1)), 6).alias(
            "alnum_ratio"
        ),
        F.when(
            F.size(lines) > 0,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6
            ),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
    )
    bigram_arr = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tok - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg_counts = (
        toked.select(F.col(id_col).alias("doc_id"), F.explode(bigram_arr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_bg = bg_counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    return base.join(top_bg, "doc_id", "left").select(
        "doc_id",
        "stopword_ratio",
        "mean_token_len",
        "alnum_ratio",
        "dup_line_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    ).withColumn(
        "quality",
        (
            (F.col("mean_token_len") >= 2)
            & (F.col("mean_token_len") <= 12)
            & (F.col("alnum_ratio") >= 0.5)
            & (F.col("dup_line_frac") <= 0.3)
            & (F.col("top_bigram_frac") <= 0.2)
        ).cast("int"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_guess, lang_hits) — argmax over per-language
    function-word hit counts; ties → lexicographically smallest language
    code; no hits → 'und'."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_toks")
    )  # own projection: the split would otherwise re-run per language
    toks = F.col("_toks")
    hit_cols = [
        F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang]))).alias(f"_h_{lang}")
        for lang in sorted(LANG_MARKERS)
    ]
    scored = toked.select("doc_id", *hit_cols)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"_h_{lang}").alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # array_max on struct compares field-by-field: max hits, then max lang —
    # we want ties → SMALLEST lang, so compare (hits, reverse-rank of lang)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"_h_{lang}").alias("hits"),
                    F.lit(-i).alias("nrank"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(sorted(LANG_MARKERS))
            ]
        )
    )
    return scored.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        best["hits"].cast("long").alias("lang_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp_norm, fp_min_shingle) — two document fingerprints:
    md5 of whitespace-normalized lowercase text (exact-ish dedup key) and
    the minimum md5 over 8-char character shingles (winnowing-style
    robust fingerprint).

    The normalized text is materialized in its own projection first —
    inlined, the regexp_replace would re-run inside every 8-char window's
    substr (hundreds of regex passes per document)."""
    normed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ").alias("_norm"),
    )
    norm = F.col("_norm")
    n = F.length(norm)
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 7, F.lit(1))),
        lambda i: F.md5(norm.substr(i, F.lit(8))),
    )
    return normed.select(
        "doc_id",
        F.md5(norm).alias("fp_norm"),
        F.array_min(shingle_hashes).alias("fp_min_shingle"),
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chars, entropy_bits) — Shannon entropy of each
    document's character distribution, the classic gibberish/encoding-
    junk filter: natural text sits around 4-4.5 bits, base64 blobs and
    single-char spam fall far outside.

    Computed as log2(n) − Σ c·ln(c) / (n·ln 2) over per-character
    counts c — exact integers into two ln calls and one small sum, so a
    6dp round makes it hash-stable cross-engine (the repo's ln
    precedent: adamic_adar, lang_id, HLL).  Chars are enumerated by
    position (transform over 1..length) because RE2-based engines have
    no lookahead splits; the explode fans out n rows per doc into one
    (doc, char)-keyed count — scan-proportional, uniform keys.
    """
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col})), "
                f"i -> substr({text_col}, i, 1))"
            )
        ).alias("c"),
    ).filter(F.col("n_chars") > 0)
    counts = chars.groupBy("doc_id", "n_chars", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.groupBy("doc_id", "n_chars").agg(
        F.round(
            (
                F.log(F.col("n_chars").cast("double"))
                - F.sum(
                    F.col("cnt").cast("double")
                    * F.log(F.col("cnt").cast("double"))
                )
                / F.col("n_chars").cast("double")
            )
            / F.lit(math.log(2.0)),
            6,
        ).alias("entropy_bits")
    )
