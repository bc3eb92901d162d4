"""Domain-level curation rollup."""

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import (
    curation,
)


def test_source_quality_rollup_hand_case(spark):
    """Two sources with hand-computable keep/dup/token aggregates."""
    good = (
        "the quick brown fox jumps over the lazy dog and then "
        "the small cat walks by the old house near the river with "
        "a very calm and happy mood for all of them there now"
    )  # 35 words, passes every quality rule
    bad = "spam spam spam"  # fails min_words
    docs = spark.createDataFrame(
        [
            (0, good, "src_a"),
            (1, good + " extra", "src_a"),  # near-dup of 0 via pairs
            (2, bad, "src_a"),
            (3, good, "src_b"),
        ],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = {r.source: r for r in curation.source_quality_rollup(docs, pairs).collect()}
    a, b = out["src_a"], out["src_b"]
    assert (a.n_docs, b.n_docs) == (3, 1)
    assert a.n_tokens == 35 + 36 + 3 and b.n_tokens == 35
    assert a.keep_rate == 2 / 3 and b.keep_rate == 1.0
    # doc 1 is the non-canonical member of cluster {0, 1}
    assert a.dup_rate == 1 / 3 and b.dup_rate == 0.0
    assert 0.0 < a.mean_quality <= 1.0 and 0.0 < b.mean_quality <= 1.0


def test_vocab_stats_counts_and_cutoff(spark):
    docs = spark.createDataFrame(
        [
            (0, "The cat and the dog and THE bird"),
            (1, "cat cat zebra"),
            (2, "   "),
        ],
        "doc_id long, text string",
    )
    out = curation.vocab_stats(docs, top_k=3).collect()
    # 'the' 3 occurrences in 1 doc; 'cat' 3 occurrences in 2 docs;
    # 'and' 2 in 1 -> top-3 is [cat|the tie -> 'cat' < 'the'], then and
    assert [(r.token, r.n_docs, r.n_occurrences) for r in out] == [
        ("cat", 2, 3),
        ("the", 1, 3),
        ("and", 1, 2),
    ]
