"""Dedup/similarity operators vs independent Python oracles on the
driver-provided documents/embeddings tables (sf0.001)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webscraper_spark.operators.similarity import (
    MINHASH_PERMS,
    POLY_MOD,
    POLY_MULT,
    cosine_topk,
    embedding_near_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


# --- Python oracle twins (independent reimplementation) -------------------

def py_words(text):
    return text.strip().lower().split()


def py_poly(s):
    acc = 0
    for ch in s:
        acc = (acc * POLY_MULT + ord(ch)) % POLY_MOD
    return acc


def py_shingle_hashes(text, k=3):
    w = py_words(text)
    return [py_poly(" ".join(w[i : i + k])) for i in range(len(w) - k + 1)]


def py_minhash(text, n=32, k=3):
    hs = py_shingle_hashes(text, k)
    return [min(((a * h + b) % POLY_MOD) for h in hs) if hs else None
            for a, b in MINHASH_PERMS[:n]]


def py_simhash(text, bits=30):
    votes = [0] * bits
    for w in py_words(text):
        h = py_poly(w)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for v in reversed(votes):
        out = out * 2 + (1 if v > 0 else 0)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_minhash_matches_python_oracle(spark, docs):
    rows = minhash_signatures(docs.limit(30)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(30).collect()}
    for r in rows:
        assert list(r["sig"]) == py_minhash(texts[r["doc_id"]]), r["doc_id"]


def test_simhash_matches_python_oracle(spark, docs):
    rows = simhash(docs.limit(30)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(30).collect()}
    for r in rows:
        assert r["simhash"] == py_simhash(texts[r["doc_id"]]), r["doc_id"]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id: long, text: string"
    )
    rows = {r["canonical_id"]: r for r in exact_dedup(df).collect()}
    assert rows[1]["n_copies"] == 2 and rows[1]["member_ids"] == [1, 2]
    assert rows[3]["n_copies"] == 1


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "completely different words here now then"),
        ],
        "doc_id: long, text: string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(df).collect()}
    # oracle: shingle sets
    def sh(t):
        w = py_words(t)
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    a, b = sh("the quick brown fox jumps over the lazy dog"), sh(
        "the quick brown fox jumps over a lazy dog"
    )
    want = len(a & b) / len(a | b)
    assert pairs[(1, 2)] == pytest.approx(want)
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_gated_skewed_corpus(spark):
    """Scale contract: with an LSH candidate gate, a shingle shared by 50%
    of the corpus must NOT blow up the plan — intersections come from
    array_intersect over the candidate pairs, and the shared-shingle
    self-join (join on the exploded hash column) never appears."""
    hot = "terms of service apply here always"  # one hot shingle run in half the docs
    rows = []
    for i in range(200):
        uniq = f"unique text body number {i} alpha beta gamma delta {i * 7} epsilon"
        rows.append((i, f"{uniq} {hot}" if i % 2 == 0 else uniq))
    # planted near-dup: 1000 is doc 0 plus one word
    rows.append((1000, rows[0][1] + " tailword"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    cand = lsh_candidate_pairs(df)
    out = ngram_jaccard_pairs(df, min_jaccard=0.5, candidates=cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert (0, 1000) in pairs
    # the hot shingle alone must not fabricate high-jaccard pairs
    assert all(j >= 0.5 for j in pairs.values())


def test_ngram_jaccard_df_cap_bounds_hot_shingles(spark):
    """Ungated path: shingles with df > max_shingle_df are dropped from
    the intersection count, so hot boilerplate can only under-estimate
    jaccard — planted near-dups (rare shingles) are still found."""
    hot = "all rights reserved worldwide forever"
    rows = []
    for i in range(100):
        rows.append((i, f"document body {i} with words {i * 3} and {i * 11} {hot}"))
    rows.append((1000, rows[0][1] + " tailword"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = ngram_jaccard_pairs(df, min_jaccard=0.5, max_shingle_df=10)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1000) in pairs
    # hot-shingle-only overlaps are capped away: no pair of unrelated docs
    assert all(a == 0 and b == 1000 for a, b in pairs)


def test_lsh_finds_near_duplicates(spark, docs):
    # construct guaranteed near-dups: doc + copy with one word changed
    base = docs.limit(20).select("doc_id", "text")
    dup = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
    )
    both = base.unionByName(dup)
    pairs = lsh_candidate_pairs(both).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for r in base.collect():
        assert (r["doc_id"], r["doc_id"] + 100000) in found


def test_lsh_candidates_superset_of_high_jaccard(spark, docs):
    """Banded LSH must recall every pair above the band threshold —
    verified against the exact Jaccard join (recall, not precision)."""
    sample = docs.limit(120)
    exact = ngram_jaccard_pairs(sample, min_jaccard=0.8)
    cands = lsh_candidate_pairs(sample)
    missing = exact.join(cands, on=["id_a", "id_b"], how="left_anti").count()
    assert missing == 0


def test_simhash_near_pairs_hamming_correct(spark, docs):
    sample = docs.limit(150)
    pairs = simhash_near_pairs(sample, max_hamming=6).collect()
    sh = {r["doc_id"]: r["simhash"] for r in simhash(sample).collect()}
    for r in pairs:
        assert bin(sh[r["id_a"]] ^ sh[r["id_b"]]).count("1") == r["hamming"]
        assert r["hamming"] <= 6


def test_cosine_topk_matches_numpy(spark, embs):
    q = embs.filter(F.col("vec_id") == 0)
    got = cosine_topk(embs, q, k=5).orderBy("rank").collect()
    rows = embs.collect()
    qv = np.array([r["embedding"] for r in rows if r["vec_id"] == 0][0], dtype=np.float64)
    scores = []
    for r in rows:
        if r["vec_id"] == 0:
            continue
        v = np.array(r["embedding"], dtype=np.float64)
        c = round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6)
        scores.append((-c, r["vec_id"]))
    want = sorted(scores)[:5]
    assert [(r["vec_id"]) for r in got] == [v for _, v in want]
    for r, (negc, _) in zip(got, want):
        assert r["cosine"] == pytest.approx(-negc, abs=1e-6)


def test_embedding_near_pairs_verified_cosine(spark, embs):
    pairs = embedding_near_pairs(embs.limit(200), min_cosine=0.5).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in embs.limit(200).collect()}
    for r in pairs[:50]:
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cosine"] == pytest.approx(want, abs=1e-5)
        assert r["cosine"] >= 0.5


def test_ivf_full_probe_equals_exact(spark):
    """nprobe = n_centroids degenerates IVF to the exact brute-force scan."""
    from pyspark.sql import functions as F

    from webscraper_spark.operators.similarity import cosine_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = e.filter(F.col("vec_id") < 6)
    q = e.filter(F.col("vec_id") % 17 == 0)
    exact = cosine_topk(e, q, k=5)
    ivf = ivf_topk(e, q, cent, k=5, nprobe=6)
    a = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    b = {(r.query_id, r.vec_id, r.rank) for r in ivf.collect()}
    assert a == b


def test_ivf_partial_probe_recall(spark):
    """nprobe=2 of 6 buckets keeps reasonable recall on clustered data."""
    from pyspark.sql import functions as F

    from webscraper_spark.operators.similarity import cosine_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = e.filter(F.col("vec_id") < 6)
    q = e.filter(F.col("vec_id") % 17 == 0)
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(e, q, k=5).collect()}
    ivf = {(r.query_id, r.vec_id) for r in ivf_topk(e, q, cent, k=5, nprobe=2).collect()}
    assert len(ivf & exact) / len(exact) >= 0.4


def test_lsh_fast_path_finds_planted_near_dups(spark):
    """The xxhash64 fast path (non-oracle) must recall planted near-dups
    exactly like the portable path does — same algorithm, faster hash."""
    from pyspark.sql import functions as F

    from webscraper_spark.operators.similarity import lsh_candidate_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant near-duplicates: copy each doc with one appended token
    dups = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    planted = {(int(r.doc_id), int(r.doc_id) + 100000) for r in docs.select("doc_id").collect()}
    from webscraper_spark.operators.similarity import lsh_candidate_pairs_pandas

    variants = {
        "portable": lambda c: lsh_candidate_pairs(c, portable=True),
        "xxhash": lambda c: lsh_candidate_pairs(c, portable=False),
        "pandas": lambda c: lsh_candidate_pairs_pandas(c),
    }
    for name, fn in variants.items():
        pairs = {(r.id_a, r.id_b) for r in fn(corpus).collect()}
        missing = planted - pairs
        assert not missing, f"{name} missed {len(missing)} planted pairs"


def test_simhash_fast_finds_planted_near_dups(spark):
    from pyspark.sql import functions as F

    from webscraper_spark.operators.similarity import (
        simhash_near_pairs,
        simhash_near_pairs_fast,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dups = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    planted = {(int(r.doc_id), int(r.doc_id) + 100000) for r in docs.select("doc_id").collect()}
    for name, fn in {"expr": simhash_near_pairs, "fast": simhash_near_pairs_fast}.items():
        pairs = {(r.id_a, r.id_b) for r in fn(corpus, max_hamming=6).collect()}
        recall = len(planted & pairs) / len(planted)
        assert recall >= 0.9, f"{name}: recall {recall}"


def test_hyperplane_lsh_recall_on_planted_near_dups(spark, embs):
    """Random-hyperplane sign-LSH: a vector and its tiny perturbation
    must share the 8-bit bucket (near-identical ⇒ every plane agrees
    w.h.p.), and the bucketing must actually split the corpus (not one
    giant bucket)."""
    from pyspark.sql import functions as F

    from webscraper_spark.operators.similarity import sign_lsh_buckets

    base = embs.limit(30).select("vec_id", "embedding")
    dup = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    b = sign_lsh_buckets(base.unionByName(dup))
    buckets = {r.vec_id: r.bucket for r in b.collect()}
    missed = [i for i in range(30) if buckets[i] != buckets[i + 100000]]
    # scaling by 1.001 never flips a sign — zero misses by construction
    assert not missed
    assert len(set(buckets.values())) >= 4  # corpus actually splits


def test_ivf_train_improves_quantizer(spark, embs):
    """Lloyd refinement must not worsen the k-means objective: mean
    max-cosine of vectors to their assigned centroid is >= the untrained
    (first-8-vectors) quantizer's, and assignment still covers all
    vectors exactly once."""
    from webscraper_spark.operators.similarity import ivf_assign, ivf_train

    e = embs.select("vec_id", "embedding")

    def objective(cents):
        a = ivf_assign(e, cents)
        from webscraper_spark.operators.similarity import cosine_col

        joined = a.join(
            cents.select(
                F.col("vec_id").alias("centroid_id") if "vec_id" in cents.columns
                else F.col("centroid_id"),
                F.col("embedding").alias("__c"),
            ),
            on="centroid_id",
        )
        row = joined.select(
            F.avg(F.expr("aggregate(zip_with(embedding, __c, (a,b) -> cast(a as double)*b), 0D, (acc,x) -> acc+x) / "
                         "(sqrt(aggregate(transform(embedding, x -> cast(x as double)*x), 0D, (acc,x) -> acc+x)) * "
                         "sqrt(aggregate(transform(__c, x -> cast(x as double)*x), 0D, (acc,x) -> acc+x)))")).alias("o"),
            F.count("*").alias("n"),
        ).collect()[0]
        return row.o, row.n

    n_total = e.count()
    init = e.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    trained = ivf_train(e, n_centroids=8, n_iters=3)
    o0, n0 = objective(init.withColumnRenamed("centroid_id", "vec_id"))
    o1, n1 = objective(trained.withColumnRenamed("centroid_id", "vec_id"))
    assert n0 == n1 == n_total  # every vector assigned exactly once
    assert o1 >= o0 - 1e-9, (o0, o1)
    assert o1 > o0  # on this corpus refinement strictly helps
