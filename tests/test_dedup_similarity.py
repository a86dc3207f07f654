"""Dedup / similarity / textstats / multimodal operator tests with
pure-Python oracles."""

from __future__ import annotations

import hashlib
import math

import pytest

from pregel_golang_implementation_spark.operators.dedup import (
    exact_duplicates,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    word_shingles,
)
from pregel_golang_implementation_spark.operators.multimodal import (
    attach_media,
    decode_features,
    frame_sample,
)
from pregel_golang_implementation_spark.operators.similarity import (
    ann_topk,
    cosine_topk,
    srp_buckets,
)
from pregel_golang_implementation_spark.operators.textstats import (
    lang_id,
    quality_score,
    token_stats,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "x"),
    (1, "the quick brown fox jumps over the lazy dog", "x"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog", "x"),  # near dup
    (3, "der hund und die katze sind nicht das problem", "x"),
    (4, "completely unrelated text about spark engines", "x"),
    (5, "", "x"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def _py_shingles(text, n=3):
    toks = text.strip().lower().split()
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


def test_exact_duplicates(spark, docs):
    out = {r["content_hash"]: r for r in exact_duplicates(docs).collect()}
    h = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert out[h]["n_docs"] == 2 and out[h]["canonical_id"] == 0


def test_word_shingles_match_python(spark, docs):
    got = {}
    for r in word_shingles(docs, n=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for did, text, _ in DOCS:
        assert got.get(did, set()) == _py_shingles(text), did


def test_minhash_identical_docs_share_all_bands(spark, docs):
    sig = minhash_signatures(word_shingles(docs, n=3), num_hashes=16)
    rows = {(r["doc_id"], r["seed"]): r["minhash"] for r in sig.collect()}
    for s in range(16):
        assert rows[(0, s)] == rows[(1, s)]
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             lsh_candidate_pairs(lsh_bands(sig, rows_per_band=4)).collect()}
    assert (0, 1) in pairs
    # near-dup (2) should share at least one band with 0/1 at 16x4
    # (not asserted — probabilistic); unrelated docs must NOT pair
    assert (3, 4) not in pairs


def test_ngram_jaccard_values(spark, docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           ngram_jaccard(docs, shingle_n=3).collect()}
    assert out[(0, 1)] == pytest.approx(1.0)
    a, b = _py_shingles(DOCS[0][1]), _py_shingles(DOCS[2][1])
    want = len(a & b) / len(a | b)
    assert out[(0, 2)] == pytest.approx(want)
    assert (3, 4) not in out  # zero overlap → no row


def test_simhash_near_dups_close(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=16).collect()}
    assert out[0] == out[1]
    ham = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[4]).count("1")
    assert ham <= ham_far


def test_cosine_topk_exact(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = cosine_topk(emb, query_ids=[0], k=3).collect()
    sims = vecs.astype("float64") @ vecs[0].astype("float64")
    norms = np.linalg.norm(vecs.astype("float64"), axis=1)
    cos = sims / (norms * norms[0])
    cos[0] = -np.inf
    want = list(np.argsort(-cos)[:3])
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] == want


def test_srp_buckets_deterministic_and_ann_recall(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(20, 8)
    rows = []
    for i in range(20):
        rows.append((2 * i, [float(x) for x in base[i]], 0))
        rows.append((2 * i + 1, [float(x) for x in base[i] + 1e-4 * rng.randn(8)], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    b1 = {r["vec_id"]: r["bucket"] for r in srp_buckets(emb, bits=6).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in srp_buckets(emb, bits=6).collect()}
    assert b1 == b2  # deterministic
    # perturbed twins land in the same bucket (tiny perturbation)
    same = sum(1 for i in range(20) if b1[2 * i] == b1[2 * i + 1])
    assert same >= 18
    ann = ann_topk(emb, query_ids=[0], k=1, bits=6).collect()
    assert ann and ann[0]["neighbor_id"] == 1  # finds its twin in-bucket


def test_token_stats_and_quality(spark, docs):
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[0]["n_tokens"] == 9
    assert ts[0]["n_chars"] == len(DOCS[0][1])
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    # markers present in doc 0: "the" twice (out of 9 tokens)
    assert q[0]["stopword_ratio"] == pytest.approx(round(2 / 9, 6), abs=1e-6)
    assert q[0]["quality"] == 1


def test_lang_id_heuristic(spark, docs):
    out = {r["doc_id"]: r["lang_guess"] for r in lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[5] == "und"


def test_multimodal_plumbing(spark, docs):
    media = attach_media(docs.filter("doc_id < 5"))
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[0]["meta"]["n_bytes"] == len(DOCS[0][1].encode())
    assert rows[0]["meta"]["sha256"] == hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    assert len(feats[0]["features"]) == 8
    assert sum(feats[0]["features"]) == pytest.approx(1.0, abs=1e-9)
    # identical payloads → identical fake features (deterministic stub)
    assert feats[0]["features"] == feats[1]["features"]
    frames = frame_sample(media, every_n_bytes=16, max_frames=4).collect()
    assert all(0 <= r["frame_no"] < 4 for r in frames)
    assert len({(r["media_id"], r["frame_no"]) for r in frames}) == len(frames)
