"""Host-rank producers for the rank-aware scheduler.

The scheduler (operators/politeness.py ``schedule(host_ranks=...)``)
consumes any small (host, host_rank double) table. This module closes
the loop by computing one FROM the corpus itself: in-link counts per
target host — the degree-1 approximation of host centrality every
production crawler starts from (harmonic centrality / PageRank refine
it later; the scheduler contract is identical).

Plan shape: corpus scan → E1 link extract (Arrow UDF) → explode →
host projection → hash aggregate. One shuffle, map-side partials; the
result is hosts-sized (tiny next to the corpus) and is broadcast by
the scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import host_present
from ..functions.urlnorm import host_of_col
from .extract import extract_links_fast


def host_inlink_ranks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, host_rank) where host_rank = number of extracted links
    pointing AT that host across the whole corpus (E1 fast-path
    extraction — the same links the crawl itself would follow)."""
    links = pages.select(
        F.explode(
            extract_links_fast(F.col(html_col), F.col(url_col))
        ).alias("href")
    )
    tgt = links.select(host_of_col(F.col("href")).alias("host")).filter(
        host_present(F.col("host"))
    )
    return tgt.groupBy("host").agg(
        F.count("*").cast("double").alias("host_rank")
    )
