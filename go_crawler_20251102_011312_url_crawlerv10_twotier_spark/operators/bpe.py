"""Distributed BPE tokenizer training over the crawled corpus.

The reference's tier-2 "tokenize" stage (`tokenizer/coordinator.go`,
`tokenizer/slowpath.go`) stops at link/text extraction; a training
pipeline goes one step further and LEARNS the subword vocabulary from
the corpus it just curated (GPT-2/Sennrich-2016 byte-pair encoding).
This module is that trainer, built the way BPE is actually distributed
(e.g. Hugging Face tokenizers' `train_from_iterator` word-count path):

* the corpus collapses to a DISTINCT-WORD frequency table first —
  pair statistics are identical on (word, freq) and the table is
  orders of magnitude smaller than the corpus (Heaps' law: ~10^7-10^8
  distinct words at 100 TB vs 10^13 tokens), so every merge iteration
  touches the small table, never the corpus;
* each merge is one map-side-partial aggregation over adjacent symbol
  pairs (weighted by word freq) + a driver argmax of ONE row — the
  same bounded-collect budget as `similarity.kmeans_train`;
* re-segmentation is a pure-Catalyst left-to-right fold
  (`F.aggregate` over the symbol array) — no Python in the loop.

Determinism contract (what the DuckDB oracle replays exactly): counts
are integer sums (order-independent); the winning pair is
(max count, ties -> lowest (a, b) by binary string order); the merge
application is the standard left-to-right non-overlapping fold, e.g.
`w w w w` under pair (w, w) becomes `ww ww`, not `ww w w`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freqs(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Whitespace-split the corpus into the distinct-word frequency
    table ``(word string, freq long)`` — the only corpus-sized pass in
    BPE training. One shuffle (groupBy word) with map-side partials;
    empty tokens from leading/trailing whitespace are dropped.

    ``\\s+`` is ASCII whitespace in both Spark (Java regex without
    UNICODE_CHARACTER_CLASS) and DuckDB (RE2), so exotic Unicode
    spaces (NBSP et al.) stay INSIDE words as ordinary symbols —
    identical tokenization on both engines by construction.
    """
    w = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    if min_freq > 1:
        w = w.filter(F.col("freq") >= min_freq)
    return w


def _char_seg(word):
    """word -> [c1, c2, ..., cn, </w>] (character-based init vocab,
    Sennrich-2016 with the end-of-word marker as its own symbol)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-position pair counts over the segmented
    word table, weighted by word frequency (every adjacent index
    position counts, including overlapping runs — the counting rule;
    the MERGE rule is the non-overlapping fold below). Map-side
    partial aggregation; the result is vocab^2-bounded, tiny.

    Fully-merged words (size(seg) == 1) are filtered out first:
    Spark's ``sequence(1, 0)`` DESCENDS ([1, 0]) instead of being
    empty, which would index past the single element."""
    seg = F.col("seg")
    words = words.filter(F.size(seg) > 1)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(seg) - 1),
        lambda i: F.struct(
            F.element_at(seg, i).alias("a"),
            F.element_at(seg, i + 1).alias("b"),
        ),
    )
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every left-to-right non-overlapping adjacent (a, b) in
    each word's segmentation with the merged symbol — a pure-Catalyst
    fold, map-only, no shuffle: acc starts as [seg[0]]; each next
    symbol either fuses with the accumulator's last element or
    appends. After fusing, the new last element is the MERGED token,
    which can never re-match ``a`` (b is non-empty), so the fold is
    exactly the standard non-overlapping rule."""
    la, lb, lm = F.lit(a), F.lit(b), F.lit(a + b)
    seg = F.col("seg")
    folded = F.aggregate(
        F.slice(seg, F.lit(2), F.size(seg) - 1),
        F.slice(seg, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lm)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return words.withColumn("seg", folded)


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` table.

    Returns ``(merges, segmented)``:

    * ``merges`` — one row per learned merge, in order:
      ``(step int, a string, b string, merged string,
      pair_count long)`` — ``pair_count`` is the corpus-weighted
      adjacent-pair count that made the pair win at that step;
    * ``segmented`` — the word table with its final ``seg``
      (array<string>) under all learned merges, ready for
      :func:`bpe_token_counts` / vocabulary export.

    Scale shape: after the one corpus-sized :func:`word_freqs` pass,
    every iteration is ONE job: the pair aggregation's one-row collect
    also materializes the current segmentation's persist (the fold is
    map-only, fused into the same scan). The grandparent persist is
    dropped only after that collect proves the child is materialized
    (deferred unpersist — no extra ``count()`` job, and nothing is
    ever recomputed), so lineage stays one fold deep. A 10^8-row word
    table iterates in seconds per merge on a real cluster, and the
    merge list itself is driver-side by construction (it is the
    model, k rows).

    Stops early if no adjacent pair remains (fully merged corpus);
    the merges table then has fewer than ``n_merges`` rows.
    """
    segmented = words.select(
        "word", "freq", _char_seg(F.col("word")).alias("seg")
    ).persist()
    merges: list[Row] = []
    pending: DataFrame | None = None  # parent awaiting child proof
    try:
        for step in range(1, int(n_merges) + 1):
            top = (
                _pair_counts(segmented)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            # the collect above materialized `segmented`; its parent
            # can no longer be needed
            if pending is not None:
                pending.unpersist()
            if not top:
                pending = None
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append(
                Row(step=step, a=a, b=b, merged=a + b, pair_count=cnt)
            )
            nxt = _apply_merge(segmented, a, b).persist()
            pending = segmented
            segmented = nxt
        if pending is not None:
            # final segmentation not yet proven materialized; force it
            # before dropping its parent so nothing recomputes
            segmented.count()
            pending.unpersist()
    except Exception:
        segmented.unpersist()
        raise
    merges_df = spark.createDataFrame(
        merges,
        "step int, a string, b string, merged string, pair_count long",
    )
    return merges_df, segmented


def bpe_token_counts(
    docs: DataFrame,
    segmented: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token counts under the learned vocabulary:
    ``(doc_id, n_words, n_bpe_tokens)`` — the compression signal a
    curation pass thresholds on (a doc whose BPE token count is ~its
    character count is noise the vocabulary cannot compress).

    One corpus pass (explode to words) + one join against the
    distinct-word table carrying ``size(seg)`` — broadcast when the
    vocabulary is small, hash join on ``word`` otherwise — then one
    groupBy(doc) sum. Words outside the table (filtered by
    ``min_freq``) fall back to character count + 1, the untrained
    segmentation length.
    """
    per_word = segmented.select(
        "word", F.size("seg").cast("long").alias("word_tokens")
    )
    exploded = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        exploded.join(per_word, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(
                F.coalesce(
                    F.col("word_tokens"),
                    (F.length("word") + 1).cast("long"),
                )
            )
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )
