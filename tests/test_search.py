"""BM25 retrieval semantics (search.term_postings / search.bm25_topk)."""

import math

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.search import (
    bm25_topk,
    term_postings,
)


def _corpus(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "apple cherry cherry cherry"),
        (3, "banana banana banana banana"),
        (4, "durian"),
        (5, "apple banana cherry durian"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_postings_exact_tf(spark):
    p = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_postings(_corpus(spark)).collect()
    }
    assert p[(1, "apple")] == 2
    assert p[(2, "cherry")] == 3
    assert p[(3, "banana")] == 4
    assert (5, "durian") in p and p[(5, "durian")] == 1


def test_bm25_tf_monotonic_and_rank_order(spark):
    """More occurrences of the query term -> higher score (equal dl
    aside); ranks are 1-based, dense within a query, score-sorted."""
    queries = spark.createDataFrame([(0, "apple")], "query_id int, term string")
    out = bm25_topk(_corpus(spark), queries, k=10).collect()
    by_rank = sorted(out, key=lambda r: r["rnk"])
    assert [r["rnk"] for r in by_rank] == list(range(1, len(by_rank) + 1))
    scores = [r["score_micro"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    # doc 1 has tf=2 with dl=3; doc 2 tf=1 dl=4; doc 5 tf=1 dl=4
    assert by_rank[0]["doc_id"] == 1


def test_bm25_rare_term_outscores_common(spark):
    """idf: the corpus-rare term contributes more than the common one
    for identical tf/dl (doc 5 holds one of each)."""
    docs = _corpus(spark)
    q = spark.createDataFrame(
        [(0, "durian"), (1, "banana")], "query_id int, term string"
    )
    out = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in bm25_topk(docs, q, k=10).collect()
    }
    assert out[(0, 5)] > out[(1, 5)]


def test_bm25_score_matches_closed_form(spark):
    """One doc, one term: score_micro equals the hand-computed Lucene
    BM25 in micro-units."""
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y y y"), (3, "z")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(0, "x")], "query_id int, term string")
    out = bm25_topk(docs, q, k=10).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1
    n_docs, total_len, tf, df, dl = 3, 7, 2, 1, 3
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tfn = (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl * n_docs) / total_len))
    assert out[0]["score_micro"] == round(1000000.0 * idf * tfn)


def test_bm25_k_bound_and_missing_term(spark):
    queries = spark.createDataFrame(
        [(0, "banana"), (1, "nosuchterm")], "query_id int, term string"
    )
    out = bm25_topk(_corpus(spark), queries, k=2).collect()
    q0 = [r for r in out if r["query_id"] == 0]
    q1 = [r for r in out if r["query_id"] == 1]
    assert len(q0) == 2  # three matches, k=2 keeps the top two
    assert q1 == []  # absent term: no rows, no crash


def test_phrase_match_exact_and_overlapping(spark):
    """Consecutive-token semantics: counts, overlap, case folding,
    punctuation tokenization, absent phrase, phrase at doc end."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.search import (
        phrase_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "Hash Join beats nested loops; hash join wins"),
            (2, "the hash, join of worlds"),  # punctuation splits; still adjacent tokens
            (3, "join hash"),  # wrong order
            (4, "ends with hash join"),
            (5, "a a a a"),  # overlapping matches of 'a a'
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(0, "hash join"), (1, "a a"), (2, "absent words")],
        "phrase_id int, phrase string",
    )
    out = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in phrase_match(docs, phrases).collect()
    }
    assert out[(0, 1)] == 2  # case-folded, twice
    assert out[(0, 2)] == 1  # 'hash, join' tokenizes to adjacent terms
    assert (0, 3) not in out
    assert out[(0, 4)] == 1  # phrase flush at the end
    assert out[(1, 5)] == 3  # overlapping anchors all count
    assert not any(pid == 2 for pid, _ in out)


def test_postings_incremental_equals_rebuild(spark):
    """Delta maintenance == full rebuild across all four delta classes,
    and unchanged docs' postings pass through WITHOUT re-tokenizing
    (verified by feeding the kept branch poisoned v1 rows: if the
    operator re-tokenized unchanged docs the poison would vanish)."""
    from pyspark.sql import functions as F

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.search import (
        postings_incremental,
        term_postings,
    )

    v1 = spark.createDataFrame(
        [
            (1, "alpha beta"),          # unchanged
            (2, "gamma gamma delta"),   # changed in v2
            (3, "epsilon"),             # removed in v2
        ],
        "doc_id long, text string",
    )
    v2 = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "zeta eta"),
            (4, "theta theta theta"),   # new
        ],
        "doc_id long, text string",
    )
    idx1 = term_postings(v1)
    dg1 = v1.select("doc_id", F.xxhash64("text").alias("digest"))
    got = postings_incremental(idx1, dg1, v2)
    want = term_postings(v2)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # pass-through proof: poison doc 1's v1 postings; delta must keep it
    poisoned = idx1.withColumn(
        "term",
        F.when(F.col("doc_id") == 1, F.concat(F.col("term"), F.lit("_v1"))).otherwise(
            F.col("term")
        ),
    )
    kept = postings_incremental(poisoned, dg1, v2)
    assert kept.filter("doc_id = 1 AND term = 'alpha_v1'").count() == 1


def test_kwic_snippets_window_clamps(spark):
    """Snippet = phrase ± context tokens, clamped at both doc edges;
    match_pos is the 1-based phrase start."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.search import (
        kwic_snippets,
    )

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 hash join t6 t7 t8"), (2, "hash join tail")],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame([(0, "hash join")], "phrase_id int, phrase string")
    out = {
        r["doc_id"]: r for r in kwic_snippets(docs, phrases, context=2).collect()
    }
    assert out[1]["match_pos"] == 4
    assert out[1]["snippet"] == "t2 t3 hash join t6 t7"
    assert out[2]["match_pos"] == 1
    assert out[2]["snippet"] == "hash join tail"
