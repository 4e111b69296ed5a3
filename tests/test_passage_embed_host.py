"""Tests for the round-3 first-class operators: passage-level repeated-
text dedup, hashed-trigram embedding generation, host curation stats +
admission throttling, and sampled IVF training."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from webscraper_spark.operators.hoststats import host_stats, throttle_admission
from webscraper_spark.operators.similarity import (
    cosine_topk,
    embed_documents,
    embed_documents_fast,
    ivf_train,
    passage_dedup,
    passage_dedup_doc_stats,
)

BOILER = "all rights reserved terms of service apply here"  # 8 words


def _docs(spark):
    rows = [
        (0, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, BOILER + " one two three four five six seven eight"),
        (2, "unique prose penguin walked across the frozen lake slowly "
            "carrying nine small fish home before sunset tonight ok"),
        (3, BOILER + " " + BOILER),  # boilerplate twice in one doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- passage dedup -----------------------------------------------------------

def test_passage_dedup_planted_recall(spark):
    out = passage_dedup(_docs(spark), span=8, min_dup_docs=2).collect()
    by_key = {(r["doc_id"], r["passage_idx"]): r for r in out}
    # the boilerplate span opens docs 0, 1, 3 → dropped everywhere
    for doc in (0, 1, 3):
        assert by_key[(doc, 0)]["keep"] is False
        assert by_key[(doc, 0)]["n_docs"] == 3
    # doc 3's second copy of the same span is also dropped
    assert by_key[(3, 1)]["keep"] is False
    # the unique tails survive
    assert by_key[(0, 1)]["keep"] is True
    assert by_key[(2, 0)]["keep"] is True
    assert by_key[(2, 1)]["keep"] is True


def test_passage_dedup_doc_stats(spark):
    stats = {
        r["doc_id"]: r
        for r in passage_dedup_doc_stats(
            passage_dedup(_docs(spark), span=8, min_dup_docs=2)
        ).collect()
    }
    assert stats[3]["n_passages"] == 2 and stats[3]["n_dropped"] == 2
    assert stats[3]["kept_ratio"] == 0.0 and stats[3]["kept_idx"] == []
    assert stats[0]["n_passages"] == 2 and stats[0]["n_dropped"] == 1
    assert stats[0]["kept_idx"] == [1]
    assert stats[2]["kept_ratio"] == 1.0


def test_passage_dedup_short_doc_empty(spark):
    d = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    assert passage_dedup(d, span=8).count() == 0


def test_passage_dedup_no_pair_join(spark):
    # scale guard: the plan never joins passages against passages — the
    # only join is passage→(hash, df) agg, so no self-join on an exploded
    # generator column appears
    df = passage_dedup(_docs(spark), span=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Generate posexplode") <= 2  # probe + agg sides only


def test_passage_dedup_portable_vs_xxhash_same_verdicts(spark):
    # production hash family must produce the same keep/drop verdicts
    a = passage_dedup(_docs(spark), portable=True).select(
        "doc_id", "passage_idx", "keep"
    )
    b = passage_dedup(_docs(spark), portable=False).select(
        "doc_id", "passage_idx", "keep"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# -- embedding generation ----------------------------------------------------

def test_embed_expr_vs_kernel_bit_identical(spark, sdfs):
    d = sdfs["pages"].select(
        F.xxhash64("url").alias("doc_id"), F.col("text")
    ).limit(120)
    a = {r["doc_id"]: r["embedding"] for r in embed_documents(d).collect()}
    b = {r["doc_id"]: r["embedding"] for r in embed_documents_fast(d).collect()}
    assert a == b


def test_embed_unit_norm_and_shape(spark):
    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog repeatedly")],
        "doc_id long, text string",
    )
    [row] = embed_documents(d).collect()
    emb = row["embedding"]
    assert len(emb) == 64
    assert abs(sum(x * x for x in emb) - 1.0) < 1e-4


def test_embed_degenerate_inputs(spark):
    d = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["embedding"] for r in embed_documents(d).collect()}
    assert out[1] == [0.0] * 64
    assert out[2] == [0.0] * 64
    fast = {r["doc_id"]: r["embedding"] for r in embed_documents_fast(d).collect()}
    assert fast[1] == [0.0] * 64 and fast[2] == [0.0] * 64
    # NULL text: expression yields NULL, kernel yields zeros — both are
    # "no embedding"; assert the kernel's explicit contract
    assert fast[3] == [0.0] * 64


def test_embed_similar_texts_closer_than_random(spark):
    rows = [
        (1, "spark shuffles data between executors during wide transformations"),
        (2, "spark shuffles data between executors during wide transformation"),
        (3, "penguins huddle together through the long antarctic winter night"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_documents(d)
    q = emb.filter(F.col("doc_id") == 1).select(
        F.col("doc_id"), F.col("embedding")
    )
    top = cosine_topk(emb, q, k=2, id_col="doc_id").collect()
    assert top[0]["doc_id"] == 2 and top[0]["cosine"] > 0.9
    assert top[1]["cosine"] < top[0]["cosine"]


# -- host stats + admission throttle ----------------------------------------

GOOD = ("the quick brown fox jumps over the lazy dog while many other "
        "words keep this document long and varied enough for the gate "
        "to score it as quality text with plenty of stopwords in it")


def _host_docs(spark):
    rows = []
    for i in range(6):  # good.example: varied, english, long
        rows.append((i, "good.example", GOOD + f" variant {i}", "en"))
    for i in range(6):  # dup.example: one page six times
        rows.append((10 + i, "dup.example", GOOD, "en"))
    for i in range(6):  # junk.example: short low-quality fragments
        rows.append((20 + i, "junk.example", f"buy cheap {i}", "en"))
    return spark.createDataFrame(
        rows, "doc_id long, host string, text string, lang string"
    )


def test_host_stats_values(spark):
    s = {r["host"]: r for r in host_stats(_host_docs(spark)).collect()}
    assert s["good.example"]["dup_rate"] == 0.0
    assert s["dup.example"]["dup_rate"] == pytest.approx(1 - 1 / 6, abs=1e-4)
    assert s["good.example"]["mean_quality"] >= 0.75
    assert s["junk.example"]["mean_quality"] <= 0.5
    assert s["good.example"]["en_ratio"] == 1.0


def test_admission_throttles_bad_hosts(spark):
    stats = host_stats(_host_docs(spark))
    frontier = spark.createDataFrame(
        [
            ("https://good.example/a", "good.example", 1),
            ("https://dup.example/a", "dup.example", 1),
            ("https://junk.example/a", "junk.example", 1),
            ("https://new.example/a", "new.example", 1),
        ],
        "url string, host string, priority int",
    )
    kept = throttle_admission(
        frontier, stats, max_dup_rate=0.5, min_quality=0.6
    )
    hosts = {r["host"] for r in kept.collect()}
    # duplicate-farm and junk hosts dropped; good host and the
    # never-seen host (no evidence) admitted
    assert hosts == {"good.example", "new.example"}


def test_admission_demotes_non_english_host(spark):
    rows = [(i, "fr.example", GOOD + f" v{i}", "fr") for i in range(4)]
    docs = spark.createDataFrame(
        rows, "doc_id long, host string, text string, lang string"
    )
    frontier = spark.createDataFrame(
        [("https://fr.example/a", "fr.example", 1)],
        "url string, host string, priority int",
    )
    [r] = throttle_admission(frontier, host_stats(docs)).collect()
    assert r["priority"] == 5  # demoted by 4, not dropped


# -- sampled IVF training ----------------------------------------------------

def test_ivf_train_sampled_deterministic(spark, sdfs):
    emb = embed_documents_fast(
        sdfs["pages"].select(F.xxhash64("url").alias("vec_id"), "text").limit(200),
        id_col="vec_id",
    )
    a = ivf_train(emb, n_centroids=4, n_iters=2, sample_fraction=0.5, seed=7)
    b = ivf_train(emb, n_centroids=4, n_iters=2, sample_fraction=0.5, seed=7)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert [r[0] for r in ra] == [r[0] for r in rb]
    assert [list(r[1]) for r in ra] == [list(r[1]) for r in rb]


def test_ivf_train_sampled_objective_reasonable(spark, sdfs):
    from webscraper_spark.operators.similarity import ivf_assign

    emb = embed_documents_fast(
        sdfs["pages"].select(F.xxhash64("url").alias("vec_id"), "text").limit(200),
        id_col="vec_id",
    ).persist()

    def objective(cents):
        from webscraper_spark.operators.similarity import cosine_col

        assigned = ivf_assign(emb, cents.select(
            F.col("centroid_id").alias("vec_id"), F.col("embedding")
        ))
        joined = assigned.alias("a").join(
            cents.alias("c"),
            F.col("a.centroid_id") == F.col("c.centroid_id"),
        )
        return joined.agg(
            F.avg(cosine_col("a.embedding", "c.embedding")).alias("o")
        ).first()["o"]

    init = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    trained = ivf_train(emb, n_centroids=4, n_iters=3, sample_fraction=0.6, seed=3)
    assert objective(trained) >= objective(init) - 1e-6
    emb.unpersist()


def test_run_round_host_reputation_gate(spark, sdfs, tmp_path):
    """End-to-end: a host marked as a duplicate farm in the reputation
    table contributes ZERO newly-admitted frontier URLs, while the
    ungated run admits some; all other hosts are unaffected."""
    from webscraper_spark.plans.round import run_crawl
    from webscraper_spark.sources.tables import TableStore

    def crawl(subdir, rep):
        store = TableStore(spark, str(tmp_path / subdir))
        run_crawl(
            store, sdfs["pages"], sdfs["seeds"], sdfs["hosts"],
            n_rounds=1, per_host_budget=3, host_reputation=rep,
        )
        frontier = store.read_snapshot("frontier", up_to=1)
        return frontier.filter(F.col("discovered_round") == 1)

    ungated = crawl("ungated", None)
    bad_host = ungated.groupBy("host").count().orderBy(
        F.col("count").desc()
    ).first()["host"]
    rep = spark.createDataFrame(
        [(bad_host, 100, 0.99, 0.9, 1.0)],
        "host string, n_docs long, dup_rate double, mean_quality double, en_ratio double",
    )
    gated = crawl("gated", rep)
    assert ungated.filter(F.col("host") == bad_host).count() > 0
    assert gated.filter(F.col("host") == bad_host).count() == 0
    # other hosts unaffected
    a = ungated.filter(F.col("host") != bad_host).count()
    b = gated.filter(F.col("host") != bad_host).count()
    assert a == b


# -- Arrow IVF assignment kernel ---------------------------------------------

def test_ivf_assign_fast_matches_declarative(spark):
    from webscraper_spark.operators.similarity import ivf_assign, ivf_assign_fast

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8)
    slow = {r["vec_id"]: r["centroid_id"]
            for r in ivf_assign(emb, cents).collect()}
    fast = {r["vec_id"]: r["centroid_id"]
            for r in ivf_assign_fast(emb, cents).collect()}
    assert slow == fast


def test_ivf_assign_fast_zero_vector_and_empty_centroids(spark):
    from webscraper_spark.operators.similarity import ivf_assign_fast

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["centroid_id"]
           for r in ivf_assign_fast(emb, cents).collect()}
    assert out[2] == 10
    assert out[1] == 10  # zero vector: all cosines 0 → smallest id
    import pytest as _pt
    with _pt.raises(ValueError):
        ivf_assign_fast(emb, cents.filter("vec_id < 0"))


def test_passage_filter_text_reconstruction(spark):
    from webscraper_spark.operators.similarity import passage_filter_text

    out = {r["doc_id"]: r for r in
           passage_filter_text(_docs(spark), span=8, min_dup_docs=2).collect()}
    # boilerplate opener removed, unique tail kept verbatim
    assert out[0]["clean_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[0]["n_kept_passages"] == 1 and out[0]["n_passages"] == 2
    assert out[1]["clean_text"] == "one two three four five six seven eight"
    # all-boilerplate doc now gets an explicit empty row (callers drop it
    # instead of silently falling back to the duplicated original text)
    assert out[3]["n_kept_passages"] == 0 and out[3]["n_passages"] == 2
    assert out[3]["clean_text"] == ""
    # fully-unique doc reassembles in order, INCLUDING the trailing
    # partial span (18 words = 2 full spans + "tonight ok")
    assert out[2]["clean_text"].startswith("unique prose penguin")
    assert out[2]["clean_text"].endswith("before sunset tonight ok")
    assert out[2]["n_kept_passages"] == 2 and out[2]["n_passages"] == 2


def test_passage_filter_text_short_doc_no_row(spark):
    # shorter than one span → no row at all (caller keeps original text)
    d = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    from webscraper_spark.operators.similarity import passage_filter_text

    assert passage_filter_text(d, span=8).count() == 0


def test_ivf_train_tol_early_stop(spark):
    # four tight, well-separated clusters: Lloyd reaches its exact fixed
    # point after one refinement; with tol set, wildly different
    # n_iters caps must land on the identical quantized centroids
    rows = []
    anchors = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
               (0.6, 0.6, 0.0)]
    vid = 0
    for ax, ay, az in anchors:
        for j in range(5):
            eps = 0.001 * j
            rows.append((vid, [ax + eps, ay, az]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, ivf_train(emb, n_centroids=4, n_iters=3,
                                    tol=1e-9).collect()))
    b = sorted(map(tuple, ivf_train(emb, n_centroids=4, n_iters=40,
                                    tol=1e-9).collect()))
    assert [r[0] for r in a] == [r[0] for r in b]
    assert [list(r[1]) for r in a] == [list(r[1]) for r in b]


def test_host_stats_from_store(spark, sdfs, tmp_path):
    from webscraper_spark.operators.hoststats import host_stats_from_store
    from webscraper_spark.plans.round import run_crawl
    from webscraper_spark.sources.tables import TableStore

    store = TableStore(spark, str(tmp_path / "rep"))
    assert host_stats_from_store(store) is None  # nothing fetched yet
    run_crawl(store, sdfs["pages"], sdfs["seeds"], sdfs["hosts"],
              n_rounds=1, per_host_budget=3)
    stats = host_stats_from_store(store, up_to=1)
    rows = stats.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert r["n_docs"] > 0


def test_text_to_embedding_near_dup_end_to_end(spark):
    """Close the loop: raw near-duplicate TEXTS → generated embeddings →
    sign-LSH bucketed near-pair search finds the planted pair and not
    the unrelated one."""
    from webscraper_spark.operators.similarity import embedding_near_pairs

    rows = [
        (1, "the training corpus pipeline deduplicates documents before "
            "tokenization and filters by language and quality signals"),
        (2, "the training corpus pipeline deduplicates documents before "
            "tokenization and filters by language and quality signal"),
        (3, "completely unrelated penguin colony thrives on antarctic "
            "krill through perpetual winter darkness every single year"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_documents_fast(d, id_col="doc_id")
    pairs = embedding_near_pairs(
        emb, min_cosine=0.9, id_col="doc_id"
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["cosine"] > 0.95


# -- Arrow ANN fast-path completion ------------------------------------------

def test_sign_lsh_fast_matches_expression(spark):
    from webscraper_spark.operators.similarity import (
        sign_lsh_buckets,
        sign_lsh_buckets_fast,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    slow = {r["vec_id"]: r["bucket"] for r in sign_lsh_buckets(emb).collect()}
    fast = {r["vec_id"]: r["bucket"] for r in sign_lsh_buckets_fast(emb).collect()}
    assert slow == fast


def test_embedding_near_pairs_fast_matches(spark):
    from webscraper_spark.operators.similarity import (
        embedding_near_pairs,
        embedding_near_pairs_fast,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    slow = sorted(map(tuple, embedding_near_pairs(emb, min_cosine=0.3).collect()))
    fast = sorted(map(tuple, embedding_near_pairs_fast(emb, min_cosine=0.3).collect()))
    assert slow == fast


def test_cosine_topk_fast_matches_declarative(spark):
    from webscraper_spark.operators.similarity import cosine_topk, cosine_topk_fast

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4)
    slow = sorted(map(tuple, cosine_topk(emb, q, k=10).collect()))
    fast = sorted(map(tuple, cosine_topk_fast(emb, q, k=10).collect()))
    assert slow == fast


def test_cosine_scores_fast_empty_query_raises(spark):
    import pytest as _pt

    from webscraper_spark.operators.similarity import cosine_scores_fast

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    with _pt.raises(ValueError):
        cosine_scores_fast(emb, emb.filter("vec_id < 0"))


# -- near-dup clustering ------------------------------------------------------

def test_connected_components_transitive(spark):
    from webscraper_spark.operators.similarity import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    cc = {r["node"]: r["cluster_id"]
          for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                  20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_long_chain(spark):
    from webscraper_spark.operators.similarity import connected_components

    # diameter 30 chain: early-stop must still reach the fixed point
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    cc = connected_components(pairs, max_iters=64).collect()
    assert {r["cluster_id"] for r in cc} == {0}
    assert len(cc) == 31


def test_contract_cc_matches_label_propagation(spark):
    # randomized graph: the O(log n) contraction path and the label-
    # propagation baseline must agree exactly (cluster_id = min id)
    import random

    from webscraper_spark.operators.similarity import (
        connected_components,
        connected_components_contract,
    )

    rng = random.Random(4)
    pairs = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    base = {(r["node"], r["cluster_id"])
            for r in connected_components(df, max_iters=64).collect()}
    fast = {(r["node"], r["cluster_id"])
            for r in connected_components_contract(df).collect()}
    assert fast == base


def test_contract_cc_deep_chain_beyond_label_cap(spark):
    # 600-hop chain: label propagation would need 600 shuffles (and
    # raises at its default cap); contraction converges in O(log n)
    # rounds
    from webscraper_spark.operators.similarity import (
        connected_components_contract,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(600)], "id_a long, id_b long"
    )
    cc = connected_components_contract(pairs).collect()
    assert {r["cluster_id"] for r in cc} == {0}
    assert len(cc) == 601


def test_contract_cc_star_and_empty(spark):
    from webscraper_spark.operators.similarity import (
        connected_components_contract,
    )

    star = spark.createDataFrame(
        [(50, i) for i in range(40)], "id_a long, id_b long"
    )
    cc = {r["node"]: r["cluster_id"]
          for r in connected_components_contract(star).collect()}
    assert set(cc.values()) == {0}
    assert len(cc) == 41
    empty = star.filter("id_a < 0")
    assert connected_components_contract(empty).count() == 0


def test_canonical_near_dedup_keeps_one_per_cluster(spark):
    from webscraper_spark.operators.similarity import canonical_near_dedup

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in canonical_near_dedup(docs, pairs).collect())
    # cluster {0,1,2} -> keep 0; {4,5} -> keep 4; 3 unpaired -> kept
    assert kept == [0, 3, 4]


def test_passage_dedup_paragraph_mode(spark):
    from webscraper_spark.operators.similarity import passage_dedup

    legal = "All rights reserved worldwide"
    rows = [
        (1, f"Intro paragraph one here today\n\n{legal}\n\nUnique body text alpha"),
        (2, f"Different intro for second doc\n\n{legal}\n\nAnother unique tail beta"),
        (3, "No duplicate paragraphs anywhere in here\n\nJust original writing"),
        (4, f"short\n\n{legal}"),  # 'short' is under min_words → no row
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = passage_dedup(d, mode="paragraph", min_dup_docs=2, min_words=2).collect()
    by = {(r["doc_id"], r["passage_idx"]): r for r in out}
    # the shared legal paragraph (normalized) is dropped in all three docs
    assert by[(1, 1)]["keep"] is False and by[(1, 1)]["n_docs"] == 3
    assert by[(2, 1)]["keep"] is False
    assert by[(4, 0)]["keep"] is False          # 'short' filtered, legal is idx 0
    # unique paragraphs survive
    assert by[(1, 0)]["keep"] is True and by[(1, 2)]["keep"] is True
    assert by[(3, 0)]["keep"] is True and by[(3, 1)]["keep"] is True
    # normalization: case/whitespace variants of the same paragraph collapse
    d2 = spark.createDataFrame(
        [(1, "ALL   rights  reserved worldwide"), (2, "all rights reserved worldwide")],
        "doc_id long, text string",
    )
    out2 = passage_dedup(d2, mode="paragraph", min_dup_docs=2, min_words=2).collect()
    assert all(r["keep"] is False and r["n_docs"] == 2 for r in out2)


def test_run_crawl_auto_host_reputation(spark, sdfs, tmp_path):
    """The self-correcting loop runs end to end: round 1 ungated (no
    evidence yet), later rounds gated by stats computed from the crawl's
    own fetched text; the run completes and commits every round."""
    from webscraper_spark.plans.round import run_crawl
    from webscraper_spark.sources.tables import TableStore

    store = TableStore(spark, str(tmp_path / "auto_rep"))
    lineages = run_crawl(
        store, sdfs["pages"], sdfs["seeds"], sdfs["hosts"],
        n_rounds=2, per_host_budget=3, auto_host_reputation=True,
    )
    assert len(lineages) == 2
    assert all(l["scheduled"] > 0 for l in lineages)
    # the synthetic corpus is healthy text, so the default thresholds
    # must not strangle discovery
    assert lineages[0]["new_urls"] > 0
