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
