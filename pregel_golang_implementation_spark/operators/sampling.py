"""Deterministic sampling and corpus mixing for training-data pipelines.

Reproducibility is the point: every sampling decision is a pure function
of (salt, stable key), so the same corpus + config yields the same
training set on any engine, any run, any partitioning — and an ablation
can re-derive exactly which documents were in each mix.  No RNG state,
no ``rand()`` (non-deterministic across retries, inexpressible in an
oracle).

Mechanism: the first 4 hex chars of md5(salt|key) are a uniform draw in
[0, 16^4); comparing them against a hex threshold string implements
P(keep) = threshold/65536 with plain string comparison — identical in
any engine with md5 (granularity 1/65536 ≈ 0.0015%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 16**4


def _hex_threshold(fraction: float) -> str:
    return format(max(0, min(_MOD, round(fraction * _MOD))), "04x")


def _draw(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))), 1, 4
    )


def hash_sample(
    docs: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen deterministically by hashed key.
    Pure filter — pushes into the scan, no shuffle, no RNG.  Different
    ``salt`` values give independent samples (e.g. train/val splits:
    train = hash_sample(d, 0.99, salt='split'); val = subtract).

    fraction ≥ 1 short-circuits to the whole frame: the hex threshold for
    1.0 is the 5-char '10000', and comparing 4-char draws against it
    lexicographically keeps only draws ≤ '1000' (~6.25% of rows) — a
    silent near-total loss for "keep everything".  fraction ≤ 0 is the
    mirror case (empty sample), short-circuited for symmetry."""
    if fraction >= 1.0:
        return docs
    if fraction <= 0.0:
        return docs.filter(F.lit(False))
    return docs.filter(_draw(key_col, salt) < F.lit(_hex_threshold(fraction)))


def mix_corpus(
    docs: DataFrame,
    multipliers: dict[str, float],
    on_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default_multiplier: float = 1.0,
) -> DataFrame:
    """Domain reweighting: replicate/downsample rows per ``on_col`` group
    to hit the target ``multipliers`` in expectation — the Pile/Gopher-
    style mixture step.  multiplier m → every row appears floor(m)
    times, plus one more with probability frac(m) (deterministic hashed
    draw), so m=2.25 means "every doc twice, and a fixed quarter of
    them a third time"; m=0.1 downsamples to a fixed tenth.

    Output adds ``copy_no`` (0-based) so downstream shuffles can
    de-correlate the replicas; (key, copy_no) stays unique.  Shape: one
    CASE ladder + explode(sequence) — pure projection + generator, no
    shuffle, no RNG; replication fan-out is exactly the configured
    mixture weight."""
    mult = F.lit(float(default_multiplier))
    for value, m in sorted(multipliers.items()):
        mult = F.when(F.col(on_col) == value, F.lit(float(m))).otherwise(mult)
    base = F.floor(mult).cast("int")
    frac = mult - F.floor(mult)
    # the fractional extra copy: draw < frac-threshold (per-row hex cmp);
    # threshold is per-row here, so build the hex string in-plan
    draw = _draw(key_col, salt)
    # explicit floor: a bare double→long CAST truncates in Spark but
    # ROUNDS in DuckDB — floor() first makes the twin exact.  %04x via
    # format_string/printf is lowercase zero-padded hex in both engines.
    thr = F.format_string("%04x", F.floor(frac * _MOD).cast("long"))
    n_copies = base + F.when(draw < thr, 1).otherwise(0)
    return (
        docs.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy_no", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def _strat_threshold(fraction: float) -> str:
    """Per-group threshold usable inside a CASE chain, where the
    ``hash_sample`` fraction≥1 short-circuit is unavailable: the 5-char
    '10000' threshold for 1.0 sorts BELOW most 4-char draws (the exact
    trap documented on hash_sample), so keep-everything clamps to 'g' —
    lexicographically above every hex draw."""
    if fraction >= 1.0:
        return "g"
    return _hex_threshold(fraction)


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-group deterministic hash sampling — the per-domain quota step
    of a corpus mix (keep 50% of a trusted source, 5% of a noisy one).

    Same md5-draw mechanism as ``hash_sample``; the per-group threshold
    is a CASE chain over ``fractions`` (a handful of literals riding the
    plan — groups are domains/sources, human-curated and small).  Still
    a pure filter: no shuffle, no RNG, pushes to the scan, and the same
    (salt, key) draw across groups means moving a document between
    sources never changes any OTHER document's fate."""
    thr = F.lit(_strat_threshold(default_fraction))
    for grp, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(group_col) == grp, F.lit(_strat_threshold(frac))
        ).otherwise(thr)
    return docs.filter(_draw(key_col, salt) < thr)


_H48_MOD = 16**12  # 2^48


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """(key, weight, skey) — a deterministic weighted sample WITHOUT
    replacement of ``k`` rows: P(row in sample) increases with its
    weight, jointly correct for all k (Efraimidis & Spirakis 2006 via
    the exponential-race form: draw u uniform per row, rank ascending
    by -ln(u)/w, keep the k smallest).  A corpus rebalancer uses this
    to pick a quality- or length-weighted subset whose membership is
    reproducible on any engine and under any partitioning.

    The uniform draw is (hash48(salt|key) + 1) / 2^48 — an exact dyadic
    rational, bit-identical everywhere (the repo's no-RNG rule);
    ``skey`` is rounded to 9dp so the cross-engine ln ulp can never
    reorder the cut, and ties break on the key.  Rows with weight ≤ 0
    are excluded (they have no sampling mass).

    Scale shape: one scan projecting the sort key, then Spark's
    distributed TakeOrderedAndProject (per-partition top-k, k-row merge
    on the driver) — the same no-global-sort discipline as top_ngrams.
    """
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    h48 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (h48 + F.lit(1)).cast("double") / F.lit(float(_H48_MOD))
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w > 0).select(
        F.col(key_col),
        w.alias("weight"),
        F.round(-F.log(u) / w, 9).alias("skey"),
    )
    return keyed.orderBy("skey", key_col).limit(k)
