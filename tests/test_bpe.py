"""Distributed BPE trainer vs a sequential pure-Python reference.

The reference implementation below is the textbook Sennrich-2016
word-frequency algorithm (the shape `tokenizer/coordinator.go`'s
"tokenize" stage stops short of): overlap-counted adjacent pairs,
(max count, lowest (a, b)) argmax, left-to-right non-overlapping
merge. The Spark trainer must reproduce it exactly — merges, final
segmentations, and token counts.
"""

import collections

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import bpe


def ref_bpe(word_freqs, n_merges):
    """Sequential reference: dict word->freq, returns (merges, segs)."""
    segs = {w: list(w) + [bpe.END_OF_WORD] for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        cnt = collections.Counter()
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        for w, s in segs.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out
    return merges, segs


WF = {
    "low": 5,
    "lower": 3,
    "newest": 6,
    "widest": 3,
    "new": 2,
    "wow": 4,
    "wwww": 1,  # the run word: overlap counting + non-overlap merging
}


def _train(spark, wf, n_merges):
    words = spark.createDataFrame(
        list(wf.items()), "word string, freq long"
    )
    merges, seg = bpe.bpe_train(spark, words, n_merges=n_merges)
    rows = [
        (r.step, r.a, r.b, r.merged, r.pair_count)
        for r in merges.orderBy("step").collect()
    ]
    segs = {r.word: list(r.seg) for r in seg.collect()}
    seg.unpersist()
    return rows, segs


def test_bpe_matches_sequential_reference(spark):
    got_merges, got_segs = _train(spark, WF, 8)
    ref_merges, ref_segs = ref_bpe(WF, 8)
    assert got_merges == ref_merges
    assert got_segs == ref_segs


def test_bpe_run_word_non_overlapping_merge(spark):
    """`w w w w` under pair (w, w) -> `ww ww` (left-to-right
    non-overlap), while the COUNT of (w, w) before the merge is the
    overlapping 3 — the two rules the determinism contract pins."""
    wf = {"wwww": 1}
    got_merges, got_segs = _train(spark, wf, 1)
    assert got_merges == [(1, "w", "w", "ww", 3)]
    assert got_segs["wwww"] == ["ww", "ww", bpe.END_OF_WORD]


def test_bpe_tie_breaks_to_lowest_pair(spark):
    """'ab' and 'cd' both have every pair at freq 1 -> ('a','b') wins
    over ('b','</w>'), ('c','d'), ('d','</w>') by binary order."""
    wf = {"ab": 1, "cd": 1}
    got_merges, _ = _train(spark, wf, 1)
    assert got_merges[0][1:3] == ("a", "b")


def test_bpe_early_stop_when_fully_merged(spark):
    """A single 2-char word fully merges in 2 steps; asking for 10
    returns only the merges that existed (the Spark loop breaks the
    way the reference's empty-Counter break does)."""
    wf = {"ab": 1}
    got_merges, got_segs = _train(spark, wf, 10)
    ref_merges, ref_segs = ref_bpe(wf, 10)
    assert got_merges == ref_merges
    assert len(got_merges) == 2
    assert got_segs["ab"] == ["ab" + bpe.END_OF_WORD]


def test_bpe_token_counts_with_fallback(spark):
    """Words excluded by min_freq fall back to char-count + 1."""
    docs = spark.createDataFrame(
        [(0, "low low wow rare"), (1, "  newest   low ")],
        "doc_id long, text string",
    )
    words = bpe.word_freqs(docs, min_freq=2)  # drops wow, rare, newest
    assert {r.word for r in words.collect()} == {"low"}
    _, seg = bpe.bpe_train(spark, words, n_merges=2)
    out = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_token_counts(docs, seg).collect()
    }
    seg.unpersist()
    # 'low' after 2 merges on a 1-word corpus: l+o, lo+w -> ['low','</w>']
    # doc 0: low(2) + low(2) + wow(3+1) + rare(4+1) = 13 tokens, 4 words
    # doc 1: newest(6+1) + low(2) = 9 tokens, 2 words (whitespace runs
    # produce empty splits that word_freqs/token_counts both drop)
    assert out == {0: (4, 13), 1: (2, 9)}


def test_word_freqs_min_freq_and_empty_tokens(spark):
    docs = spark.createDataFrame(
        [(0, " a a  b "), (1, "a c")], "doc_id long, text string"
    )
    wf = {r.word: r.freq for r in bpe.word_freqs(docs).collect()}
    assert wf == {"a": 3, "b": 1, "c": 1}
    wf2 = {r.word: r.freq for r in bpe.word_freqs(docs, min_freq=2).collect()}
    assert wf2 == {"a": 3}


def test_bpe_fold_is_pure_catalyst(spark):
    """The re-segmentation fold must stay JVM-side: no BatchEvalPython
    / ArrowEvalPython in the plan (UDF-free by construction)."""
    words = spark.createDataFrame([("low", 1)], "word string, freq long")
    seg0 = words.select(
        "word", "freq", bpe._char_seg(F.col("word")).alias("seg")
    )
    plan = bpe._apply_merge(seg0, "l", "o")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
