"""O1 coordinator routing — each rule + precedence
(tokenizer/coordinator.go:42-99)."""

import pytest
from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.routing import (
    FAST_SIZE_LIMIT,
    SLOW_SIZE_LIMIT,
    route_decide_py,
    route_decision_col,
)

CASES = [
    # rule 1: big body -> slow, beats any fast signal (:49-52)
    ("https://h.x/sitemap", SLOW_SIZE_LIMIT + 1, "slow"),
    ("https://h.x/sitemap", SLOW_SIZE_LIMIT, "fast"),  # == limit not >
    # rule 2: slow keywords beat small-size fast (:55-61)
    ("https://h.x/research/a", 10, "slow"),
    ("https://h.x/DOCUMENT/a", 10, "slow"),  # lowercased match
    ("https://h.x/paper", 10, "slow"),
    ("https://h.x/publication", 10, "slow"),
    ("https://h.x/library", 10, "slow"),
    # rule 3: query params -> slow (:65-68)
    ("https://h.x/a?q=1", 10, "slow"),
    ("https://h.x/a?q=1#f", 10, "slow"),
    # rule 4: small -> fast (:73-76)
    ("https://h.x/anything/deep/path/here", FAST_SIZE_LIMIT - 1, "fast"),
    # rule 5: fast keywords for mid-size (:79-87)
    ("https://h.x/w/x/y/sitemap", FAST_SIZE_LIMIT, "fast"),
    ("https://h.x/w/x/y/archive", 200_000, "fast"),
    ("https://h.x/w/x/y/category", 200_000, "fast"),
    ("https://h.x/w/x/y/tag", 200_000, "fast"),
    ("https://h.x/w/x/y/index", 200_000, "fast"),
    ("https://h.x/w/x/y/list", 200_000, "fast"),
    # rule 6: shallow path (<= 3 split parts) mid-size -> fast (:90-94)
    ("https://h.x/sec/page", 200_000, "fast"),  # ['', 'sec', 'page']
    ("https://h.x/a/b/c", 200_000, "slow"),  # 4 parts -> default
    ("https://h.x", 200_000, "fast"),  # empty path -> 1 part
    # default: mid-size deep content page -> slow (:97-98)
    ("https://h.x/a/b/c/d", 200_000, "slow"),
]


@pytest.mark.parametrize("url,size,expected", CASES)
def test_route_py(url, size, expected):
    assert route_decide_py(url, size) == expected


def test_route_col_matches_py(spark):
    df = spark.createDataFrame(
        [(u, s) for u, s, _ in CASES], "url string, body_size long"
    )
    got = df.select("url", "body_size", route_decision_col("url", "body_size").alias("p")).collect()
    for (u, s, expected), r in zip(CASES, got):
        assert r["p"] == expected, (u, s)
