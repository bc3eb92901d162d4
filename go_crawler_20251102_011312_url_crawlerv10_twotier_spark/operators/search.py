"""Corpus search: inverted postings and BM25 top-k retrieval.

A crawled corpus is only useful if you can query it; the reference
stores extracted text as flat files (downloader/downloader.go:204-215)
with no retrieval path at all. This module adds the batch search
surface a 100 TB corpus needs: a term-postings build (the inverted
index) and Lucene-flavored BM25 ranking for a set of term queries.

Determinism contract (exact-gate safe): every per-row score is a fixed
IEEE-double expression tree over EXACT integer inputs (tf, df, dl,
n_docs, total_len) — no float aggregates feed any float. The per-term
score is rounded to integer micro-units *before* the per-doc sum, so
the aggregation is pure BIGINT and partition-order-free (the
source_quality_rollup / dsir_importance pattern). avgdl never exists
as a float: ``b * dl / avgdl`` is computed as ``b * (dl * N) /
total_len`` from the two exact totals.

Scale shape: tokenize + tf is one map-side-partialed aggregation; the
query term list is broadcast; df is computed only for query terms;
the final top-k is a per-query window (partitioned by query_id, never
a global sort). Nothing materializes the full postings list driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"
K1 = 1.2
B = 0.75


def term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) — lowercase alnum-run tokens, exact counts."""
    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k docs per query.

    ``queries``: (query_id, term) — one row per query term. Returns
    (query_id, doc_id, rnk, score_micro) with ``score_micro`` =
    sum over query terms of round(1e6 * idf * tfnorm) as BIGINT,
    idf = ln(1 + (N - df + .5)/(df + .5)) (Lucene BM25), ranked by
    (score_micro DESC, doc_id ASC), rnk 1-based, at most ``k`` rows
    per query.
    """
    p = term_postings(docs, id_col, text_col)
    dl = p.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    tot = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    terms = queries.select("term").distinct()
    dfs = (
        p.join(F.broadcast(terms), "term")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    matched = (
        p.join(F.broadcast(queries), "term")
        .join(F.broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    denom = F.col("tf").cast("double") + F.lit(K1) * (
        F.lit(1.0)
        - F.lit(B)
        + F.lit(B) * (F.col("dl").cast("double") * F.col("n_docs")) / F.col("total_len")
    )
    s_u = (
        F.round(
            F.lit(1000000.0) * idf * (F.col("tf").cast("double") * F.lit(K1 + 1.0)) / denom
        )
        .cast("bigint")
        .alias("s_u")
    )
    agg = (
        matched.select("query_id", "doc_id", s_u)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s_u").cast("bigint").alias("score_micro"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "rnk", "score_micro")
    )


def _phrase_candidates(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str,
    text_col: str,
    phrase_col: str,
) -> DataFrame:
    """Shared plan skeleton for :func:`phrase_match` / :func:`kwic_snippets`.

    Plan shape (no BNLJ, no per-anchor token-array replication): token
    occurrences posexplode once; a BROADCAST HASH join on the phrase's
    FIRST term prunes to candidate anchors carrying only (doc_id,
    phrase_id, pos); anchors are AGGREGATED into one sorted position
    array per (doc_id, phrase_id) BEFORE the per-doc token array joins
    in — so ``toks`` crosses the join exactly once per (doc, phrase)
    pair, not once per first-term occurrence. The pre-aggregation is
    the load-bearing step: for a stopword-first phrase, anchors are
    ~5 % of all tokens, and joining ``toks`` per-anchor would ship
    O(0.05·L²) bytes for an L-token doc (multi-GB for one doc at the
    5 MB body cap). Here the shuffled anchor rows are 3 scalars each
    and the joined state is O(L + n_anchors) per pair.

    Returns (phrase_id, doc_id, terms, plen, poss, toks) with ``poss``
    the ascending 0-based anchor positions; verification happens in the
    caller as one array-lambda pass over the single ``toks`` copy.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(TOKEN_PATTERN),
            0,
        ).alias("toks"),
    )
    ph = phrases.select(
        "phrase_id",
        F.split(F.lower(F.col(phrase_col)), r"\s+").alias("terms"),
    ).select(
        "phrase_id",
        "terms",
        F.col("terms")[0].alias("first_term"),
        F.size("terms").alias("plen"),
    )
    occ = toks.select("doc_id", F.posexplode("toks").alias("pos", "term"))
    anchors = occ.join(
        F.broadcast(ph.select("phrase_id", "first_term")),
        occ.term == F.col("first_term"),
    ).select("doc_id", "phrase_id", "pos")
    grouped = anchors.groupBy("doc_id", "phrase_id").agg(
        F.sort_array(F.collect_list("pos")).alias("poss")
    )
    return grouped.join(
        F.broadcast(ph.select("phrase_id", "terms", "plen")), "phrase_id"
    ).join(toks, "doc_id")


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Exact consecutive-token phrase search: which docs contain the
    phrase, and how many times — the positional-postings capability
    BM25's bag-of-words scoring cannot answer.

    ``phrases``: (phrase_id, phrase) — whitespace-separated terms,
    tokenized with the same TOKEN_PATTERN as the postings build.

    Plan shape: see :func:`_phrase_candidates` — anchors pre-aggregated
    per (doc, phrase), the token array joined ONCE per pair, and every
    anchor verified in a single ``filter`` array lambda
    (``slice(toks, p+1, plen) == terms``). The classic alternatives
    both fail at scale: carrying the token array through the explode
    (or joining it per-anchor) is quadratic bytes per doc, and a
    phrases crossJoin is a nested-loop over the corpus.

    Output: (phrase_id, doc_id, n_matches), only rows with >= 1 match.
    """
    cand = _phrase_candidates(docs, phrases, id_col, text_col, phrase_col)
    n_matches = F.size(
        F.filter(
            F.col("poss"),
            lambda p: F.slice(F.col("toks"), p + F.lit(1), F.col("plen"))
            == F.col("terms"),
        )
    )
    return (
        cand.select(
            "phrase_id", "doc_id", n_matches.cast("bigint").alias("n_matches")
        )
        .filter(F.col("n_matches") >= 1)
    )


def postings_incremental(
    index_v1: DataFrame,
    digests_v1: DataFrame,
    docs_v2: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maintain the inverted index across a recrawl WITHOUT rebuilding:
    unchanged docs keep their v1 postings verbatim (doc-keyed semi
    join — digests move, text doesn't), new/changed docs re-tokenize,
    removed docs' postings drop. At a weekly 1-10 % delta this is the
    difference between re-tokenizing 100 TB and re-tokenizing the
    delta — the index-side twin of run_incremental_pipeline's
    tier2_diff rule, and provably equal to a full rebuild (the gate
    oracle IS the rebuild).

    ``index_v1``: (doc_id, term, tf) from :func:`term_postings`.
    ``digests_v1``: (doc_id, digest) — xxhash64 of the v1 text.
    ``docs_v2``: the new corpus (id_col, text_col).

    Returns the v2 postings (doc_id, term, tf).
    """
    d2 = docs_v2.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("_dg2"),
        F.col(text_col).alias("_text"),
    )
    d1 = digests_v1.select("doc_id", F.col("digest").alias("_dg1"))
    j = d2.join(d1, "doc_id", "left")
    unchanged_ids = j.filter(F.col("_dg1") == F.col("_dg2")).select("doc_id")
    fresh = j.filter(F.col("_dg1").isNull() | (F.col("_dg1") != F.col("_dg2")))
    kept = index_v1.join(unchanged_ids, "doc_id", "left_semi")
    rebuilt = term_postings(
        fresh.select("doc_id", F.col("_text").alias("text")), "doc_id", "text"
    )
    return kept.unionByName(rebuilt)


def kwic_snippets(
    docs: DataFrame,
    phrases: DataFrame,
    context: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Keyword-in-context: every exact phrase occurrence with up to
    ``context`` tokens either side — the search-results snippet (and
    the concordance view corpus linguists read). Same plan skeleton as
    :func:`phrase_match` (posexplode once, broadcast first-term anchor
    join, doc-keyed array re-join), with the snippet cut from the
    token array by pure slice arithmetic in the SAME projection — no
    extra pass over the text.

    Output: (phrase_id, doc_id, match_pos, snippet) — match_pos is the
    1-based token position of the phrase start; one row per occurrence.
    """
    cand = _phrase_candidates(docs, phrases, id_col, text_col, phrase_col)

    def _snip(p):
        start = F.greatest(p + F.lit(1) - F.lit(context), F.lit(1))
        end = F.least(p + F.col("plen") + F.lit(context), F.size("toks"))
        return F.struct(
            (p + F.lit(1)).cast("bigint").alias("match_pos"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), start, end - start + 1)
            ).alias("snippet"),
        )

    hits = F.transform(
        F.filter(
            F.col("poss"),
            lambda p: F.slice(F.col("toks"), p + F.lit(1), F.col("plen"))
            == F.col("terms"),
        ),
        _snip,
    )
    return cand.select(
        "phrase_id", "doc_id", F.explode(hits).alias("hit")
    ).select("phrase_id", "doc_id", "hit.match_pos", "hit.snippet")
