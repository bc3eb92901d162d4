"""Sitemap ingestion (engine-native; the reference has none).

A production frontier at 10^10 URLs does not discover everything by
link-walking: sitemaps enumerate a host's canonical URLs (and their
``<lastmod>`` freshness hints) in one fetch. Like robots.txt
(operators/robots.py), sitemap documents live IN the corpus — the
synthetic corpus is the web — under ``https://host/sitemap.xml`` (plus
any ``.xml`` the index points at), and extraction is a pure-Catalyst
scan + regexp projection: JVM-side, whole-stage-codegen, zero Python.

Two document kinds per sitemaps.org:

* urlset   — ``<url><loc>…</loc>[<lastmod>…</lastmod>]</url>`` entries;
* index    — ``<sitemap><loc>…</loc></sitemap>`` entries pointing at
  child sitemap documents.

``sitemap_seeds`` resolves one index level (indexes-of-indexes are rare
and can be handled by calling it on the child set again), then unions
direct urlset entries — the discovery feed a crawl can merge into its
seed frontier (``CrawlConfig.discover_sitemaps``).

Scale shape: the sitemap row set is host-bounded (one row per sitemap
document — tiny next to the corpus), the explode fans out to one row
per listed URL, and nothing shuffles until the consumer joins/dedups;
the index resolution joins child-sitemap URLs (small) against the
corpus scan's url_norm — a broadcast-able semi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# any .xml under a host whose name contains 'sitemap' — covers
# /sitemap.xml, /sitemap-news.xml, /sitemaps/part-01.xml
SITEMAP_URL_RX = r"^https?://[^/]+/[^?#]*sitemap[^/?#]*\.xml$"
_HOST_RX = r"^https?://([^/]+)/"


def _blocks(body, tag: str):
    """All ``<tag>…</tag>`` inner bodies — (?s) so entries span lines."""
    return F.regexp_extract_all(
        body, F.lit(rf"(?s)<{tag}\b[^>]*>(.*?)</{tag}>"), F.lit(1)
    )


def _field(block, tag: str):
    out = F.regexp_extract(block, rf"<{tag}>\s*([^<]*?)\s*</{tag}>", 1)
    return F.when(out != "", out)


def sitemap_entries(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """urlset entries of every sitemap document in the corpus.

    Output: (host, sitemap_url, loc, lastmod string|null). Pure
    Catalyst (regexp_extract_all + explode) — no UDF.
    """
    body = F.col(body_col).cast("string")
    sm = corpus.filter(F.col(url_col).rlike(SITEMAP_URL_RX)).select(
        F.regexp_extract(F.col(url_col), _HOST_RX, 1).alias("host"),
        F.col(url_col).alias("sitemap_url"),
        F.explode(_blocks(body, "url")).alias("_entry"),
    )
    return sm.select(
        "host",
        "sitemap_url",
        _field(F.col("_entry"), "loc").alias("loc"),
        _field(F.col("_entry"), "lastmod").alias("lastmod"),
    ).filter(F.col("loc").isNotNull())


def sitemap_index_children(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """index entries: (host, index_url, child) per ``<sitemap><loc>``."""
    body = F.col(body_col).cast("string")
    sm = corpus.filter(F.col(url_col).rlike(SITEMAP_URL_RX)).select(
        F.regexp_extract(F.col(url_col), _HOST_RX, 1).alias("host"),
        F.col(url_col).alias("index_url"),
        F.explode(_blocks(body, "sitemap")).alias("_entry"),
    )
    return sm.select(
        "host",
        "index_url",
        _field(F.col("_entry"), "loc").alias("child"),
    ).filter(F.col("child").isNotNull())


def sitemap_seeds(
    corpus: DataFrame, url_col: str = "url_norm", body_col: str = "html"
) -> DataFrame:
    """All URLs a host's sitemaps enumerate, one index level deep.

    Direct urlset entries UNION entries of child sitemaps referenced by
    index documents — restricted to children actually present in the
    corpus (an absent child is a fetch miss, exactly like any other
    URL). Output: (host, loc, lastmod) distinct on (host, loc), keeping
    the max lastmod when the same loc appears in several sitemaps.
    """
    direct = sitemap_entries(corpus, url_col, body_col)

    # children an index points at whose names DON'T match the sitemap
    # pattern (e.g. /parts/a.xml): fetch their corpus rows via a
    # semi-join (child set is host-bounded — broadcast it) and run the
    # same urlset extraction over them. Children that do match the
    # pattern are already in `direct`.
    children = sitemap_index_children(corpus, url_col, body_col).filter(
        ~F.col("child").rlike(SITEMAP_URL_RX)
    )
    body = F.col(body_col).cast("string")
    child_docs = corpus.join(
        F.broadcast(children.select(F.col("child").alias(url_col)).distinct()),
        url_col,
        "semi",
    )
    via_index = child_docs.select(
        F.regexp_extract(F.col(url_col), _HOST_RX, 1).alias("host"),
        F.col(url_col).alias("sitemap_url"),
        F.explode(_blocks(body, "url")).alias("_entry"),
    ).select(
        "host",
        "sitemap_url",
        _field(F.col("_entry"), "loc").alias("loc"),
        _field(F.col("_entry"), "lastmod").alias("lastmod"),
    ).filter(F.col("loc").isNotNull())

    return (
        direct.unionByName(via_index)
        .groupBy("host", "loc")
        .agg(F.max("lastmod").alias("lastmod"))
    )
