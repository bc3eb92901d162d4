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


def test_doc_keyterms_ranks_distinctive_tokens(spark):
    """Tokens unique to a doc outrank corpus-wide ones; tf breaks the
    df tie; rank caps at k."""
    docs = spark.createDataFrame(
        [
            (0, "common rare rare unique"),
            (1, "common rare other"),
            (2, "common filler words"),
        ],
        "doc_id long, text string",
    )
    out = curation.doc_keyterms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append((r.rank, r.token, r.score))
    for v in by_doc.values():
        v.sort()
    # doc 0: unique (1/1) and rare (2/2 -> 1.0) tie at 1.0 -> token ASC
    assert [t for _, t, _ in by_doc[0]] == ["rare", "unique"]
    assert [s for _, _, s in by_doc[0]] == [1.0, 1.0]
    # doc 1: other (1/1) beats rare (1/2) beats common (1/3)
    assert [t for _, t, _ in by_doc[1]] == ["other", "rare"]
    # every doc emits at most k rows
    assert all(len(v) == 2 for v in by_doc.values())


def test_bigram_commonness_hand_case(spark):
    """Closed-form fixture: corpus bigrams ab:2 ba:1 bc:1 cc:1,
    prefixes a:2 b:2 c:1 → micro ab=10^6, ba=bc=5·10^5, cc=10^6."""
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "c c"), (3, "solo")],
        "doc_id bigint, text string",
    )
    got = {r.id: r for r in curation.bigram_commonness(docs).collect()}
    assert got[1].n_bigrams == 4
    assert got[1].sum_micro_p == 2 * 1_000_000 + 500_000 + 500_000
    assert got[1].mean_cond_p == 0.75
    assert (got[2].n_bigrams, got[2].sum_micro_p, got[2].mean_cond_p) == (
        1,
        1_000_000,
        1.0,
    )
    assert 3 not in got  # single-token doc: no bigram evidence


def test_bigram_commonness_flags_word_salad(spark):
    """Common words in improbable order score below fluent text built
    from the same vocabulary — the separation unigrams cannot make."""
    fluent = "the cat sat on the mat " * 5
    salad = "the the on cat mat sat on mat the cat sat the"
    docs = spark.createDataFrame(
        [(1, fluent.strip()), (2, fluent.strip()), (3, salad)],
        "doc_id bigint, text string",
    )
    got = {r.id: r.mean_cond_p for r in curation.bigram_commonness(docs).collect()}
    assert got[3] < got[1]


def test_unigram_commonness_hand_case(spark):
    """Corpus: 'the the cat' + 'the zxq' -> counts: the=3, cat=1,
    zxq=1, total=5. Exact rational expectations per doc."""
    docs = spark.createDataFrame(
        [
            (0, "the the cat"),
            (1, "the zxq"),
            (2, ""),  # empty text never emits a row
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in curation.unigram_commonness(docs).collect()}
    assert set(out) == {0, 1}
    d0, d1 = out[0], out[1]
    # doc 0: tokens (the, the, cat) -> sum_cnt = 3+3+1 = 7, n=3
    assert (d0.n_tokens, d0.sum_cnt) == (3, 7)
    assert d0.mean_p == 7 / (3 * 5)
    assert d0.rare_rate == 1 / 3  # cat is a hapax
    # doc 1: tokens (the, zxq) -> sum_cnt = 3+1 = 4, n=2
    assert (d1.n_tokens, d1.sum_cnt) == (2, 4)
    assert d1.mean_p == 4 / (2 * 5)
    assert d1.rare_rate == 1 / 2  # zxq is a hapax
    # junk doc scores strictly below the fluent one
    assert d1.mean_p < d0.mean_p or d1.rare_rate > d0.rare_rate


def test_repetition_stats_hand_case(spark):
    """Doc 0: 4 non-empty lines, 'nav menu' repeated twice (8 chars
    per copy); bigrams of 'a b a b a' -> 'a b' x2, 'b a' x2 -> top 2/4.
    Doc 1: single token, no bigrams. Doc 2: blank, no row."""
    docs = spark.createDataFrame(
        [
            (0, "nav menu\nbody text here\n\nnav menu\nfooter"),
            (1, "solo"),
            (2, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in curation.repetition_stats(docs).collect()}
    assert set(out) == {0, 1}
    d0 = out[0]
    assert d0.n_lines == 4
    assert d0.dup_line_frac == 1 / 4  # one repeat occurrence of 4
    # chars: nav menu(8)x2 + body text here(14) + footer(6) = 36; dup = 8
    assert d0.dup_line_char_frac == 8 / 36
    # tokens: nav menu body text here nav menu footer -> 7 bigrams,
    # 'nav menu' appears twice -> 2/7
    assert d0.n_bigrams == 7
    assert d0.top_bigram_frac == 2 / 7
    d1 = out[1]
    assert (d1.n_lines, d1.n_bigrams) == (1, 0)
    assert d1.dup_line_frac == 0.0 and d1.top_bigram_frac == 0.0


def test_sequence_pack_hand_case(spark):
    """Closed-form packing: 3-token docs into 4-token sequences inside
    one shard — offsets, sequence indices and boundary flags are all
    hand-computable."""
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(4)] + [(4, "  "), (5, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in curation.sequence_pack(
            docs, seq_len=4, shard_docs=100
        ).collect()
    }
    # token stream: doc0 [0,3) doc1 [3,6) doc2 [6,9) doc3 [9,12)
    assert (got[0].tok_start, got[0].first_seq, got[0].last_seq) == (0, 0, 0)
    assert not got[0].spans_boundary
    assert (got[1].tok_start, got[1].first_seq, got[1].last_seq) == (3, 0, 1)
    assert got[1].spans_boundary
    assert (got[2].first_seq, got[2].last_seq) == (1, 2)
    assert (got[3].first_seq, got[3].last_seq) == (2, 2)
    # blank doc: zero tokens, pinned to its offset's sequence
    assert (got[4].n_tokens, got[4].first_seq, got[4].last_seq) == (0, 3, 3)
    assert not got[4].spans_boundary
    assert got[5].tok_start == 12


def test_sequence_pack_partitioning_invariant(spark):
    """The layout must not depend on input partitioning — the property
    that makes per-shard packing re-runnable over any subset."""
    docs = spark.range(0, 200).selectExpr(
        "id AS doc_id", "repeat('w ', CAST(id % 7 + 1 AS INT)) AS text"
    )
    a = curation.sequence_pack(docs.repartition(1), seq_len=16, shard_docs=32)
    b = curation.sequence_pack(
        docs.repartition(13, "text"), seq_len=16, shard_docs=32
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_stats_accounting(spark):
    """Per-shard audit: pad_tokens = n_seqs*L - n_tokens, and the
    spanning count matches the per-doc flags."""
    docs = spark.range(0, 100).selectExpr(
        "id AS doc_id", "repeat('t ', CAST(id % 5 + 1 AS INT)) AS text"
    )
    packed = curation.sequence_pack(docs, seq_len=8, shard_docs=25)
    stats = {r.shard: r for r in curation.pack_stats(packed, seq_len=8).collect()}
    per_doc = packed.collect()
    assert set(stats) == {0, 1, 2, 3}
    for shard, s in stats.items():
        mine = [r for r in per_doc if r.shard == shard]
        assert s.n_docs == len(mine)
        assert s.n_tokens == sum(r.n_tokens for r in mine)
        assert s.n_seqs == max(r.last_seq for r in mine) + 1
        assert s.n_spanning == sum(r.spans_boundary for r in mine)
        assert s.pad_tokens == s.n_seqs * 8 - s.n_tokens
        assert 0 <= s.pad_tokens < 8  # tail waste bounded by one seq


def test_pack_stats_empty_shard(spark):
    """A shard whose docs are all zero-token produces NO sequence:
    n_seqs = 0 and pad_tokens = 0, not the phantom one-sequence/
    seq_len-padding a naive max(last_seq)+1 would report. Keeps the
    'tail waste < one sequence per shard' invariant exact."""
    docs = spark.createDataFrame(
        # shard 0 (ids 0-24): empty texts only; shard 1: one real doc
        [(0, ""), (1, "   "), (2, ""), (25, "t t t")],
        "doc_id long, text string",
    )
    packed = curation.sequence_pack(docs, seq_len=8, shard_docs=25)
    stats = {r.shard: r for r in curation.pack_stats(packed, seq_len=8).collect()}
    assert (stats[0].n_seqs, stats[0].pad_tokens) == (0, 0)
    assert stats[0].n_tokens == 0 and stats[0].n_docs == 3
    assert (stats[1].n_seqs, stats[1].n_tokens, stats[1].pad_tokens) == (1, 3, 5)
    for s in stats.values():
        assert 0 <= s.pad_tokens < 8  # invariant holds on the edge too


def test_strip_host_boilerplate_hand_case(spark):
    """Host-scoped df threshold: a line on >=3 pages of ONE host is
    stripped there, the same line across DIFFERENT hosts is not;
    content order survives; an all-chrome page keeps an empty
    clean_text instead of vanishing."""
    nav = "NAV home"
    docs = spark.createDataFrame(
        [
            (0, "a.x", nav + "\nbody zero\nfooter a"),
            (1, "a.x", nav + "\nbody one\nfooter a"),
            (2, "a.x", nav + "\nbody two\nfooter a"),
            (3, "a.x", nav + "\nfooter a"),  # all chrome
            # nav appears on b.x only twice -> below min_df, kept
            (4, "b.x", nav + "\nbody four"),
            (5, "b.x", nav + "\nbody five"),
        ],
        "doc_id long, host string, text string",
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        strip_host_boilerplate,
    )

    got = {r.doc_id: r for r in strip_host_boilerplate(docs, min_df=3).collect()}
    assert len(got) == 6  # every doc survives
    assert got[0].clean_text == "body zero"
    assert (got[0].n_lines, got[0].n_boiler) == (3, 2)
    assert got[3].clean_text == "" and got[3].n_boiler == 2
    # cross-host: b.x's nav has df=2 < 3 -> kept
    assert got[4].clean_text == nav + "\nbody four"
    assert got[5].n_boiler == 0


def test_strip_host_boilerplate_salted_identical(spark):
    """The salted host join is pure routing: salted and unsalted give
    row-identical results, and host_boiler_sets' cap keeps the
    highest-df lines with the pre-cap count still reported."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        host_boiler_sets,
        strip_host_boilerplate,
    )

    docs = spark.createDataFrame(
        [
            (i, "mega.x", "NAV home\nbody %d\nfooter" % i)
            for i in range(8)
        ]
        + [(100, "tail.x", "NAV home\nsolo body")],
        "doc_id long, host string, text string",
    )
    salted = strip_host_boilerplate(docs, min_df=3, salt_partitions=4)
    plain = strip_host_boilerplate(docs, min_df=3, salt_partitions=1)
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(salted.collect(), key=key) == sorted(
        plain.collect(), key=key
    )
    got = {r.doc_id: r for r in salted.collect()}
    assert got[0].clean_text == "body 0"
    assert got[100].clean_text == "NAV home\nsolo body"  # host-scoped
    # vocabulary audit: mega.x has 2 boiler lines (NAV df=8, footer
    # df=8); cap=1 keeps the higher-sorted one but reports both
    sets = {
        r.host: r
        for r in host_boiler_sets(docs, min_df=3, max_lines=1).collect()
    }
    assert sets["mega.x"].n_boiler_lines == 2
    assert len(sets["mega.x"].boiler_lines) == 1
    assert "tail.x" not in sets  # df=1 each, below min_df


def test_strip_host_boilerplate_order_preserved(spark):
    """Multiple surviving lines rebuild in original position order
    regardless of shuffle order."""
    docs = spark.createDataFrame(
        [
            (0, "h.x", "top\nalpha\nmid\nbeta\nbottom"),
            (1, "h.x", "top\ngamma\nmid\ndelta\nbottom"),
            (2, "h.x", "top\nepsilon\nmid\nzeta\nbottom"),
        ],
        "doc_id long, host string, text string",
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        strip_host_boilerplate,
    )

    got = {r.doc_id: r for r in strip_host_boilerplate(docs, min_df=3).collect()}
    assert got[0].clean_text == "alpha\nbeta"
    assert got[1].clean_text == "gamma\ndelta"
    assert got[2].clean_text == "epsilon\nzeta"
    assert all(r.n_boiler == 3 for r in got.values())  # top/mid/bottom


def test_paragraph_dedup_keep_first_global(spark):
    """Corpus-global keep-first: the duplicate paragraph survives only
    in the lowest (doc_id, pos) slot; within one doc the earlier
    position wins; unique paragraphs all survive in order."""
    P = "\n\n"
    docs = spark.createDataFrame(
        [
            (2, P.join(["dup", "two-a"])),
            (0, P.join(["zero-a", "dup", "zero-b", "dup"])),
            (1, P.join(["dup", "one-a"])),
        ],
        "doc_id long, text string",
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        paragraph_dedup,
    )

    got = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    # doc 0 holds the global first occurrence of "dup" (pos 1) and
    # loses its own later repeat (pos 3)
    assert got[0].clean_text == P.join(["zero-a", "dup", "zero-b"])
    assert (got[0].n_paras, got[0].n_kept, got[0].n_dropped) == (4, 3, 1)
    assert got[1].clean_text == "one-a"
    assert got[2].clean_text == "two-a"
    assert got[1].n_dropped == 1 and got[2].n_dropped == 1


def test_paragraph_dedup_all_dropped_doc_survives(spark):
    """A doc made entirely of already-seen paragraphs keeps an empty
    clean_text row (never vanishes); empty paragraphs don't count."""
    P = "\n\n"
    docs = spark.createDataFrame(
        [(0, "a" + P + "b"), (1, "b" + P + "a"), (2, "")],
        "doc_id long, text string",
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        paragraph_dedup,
    )

    got = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert got[0].clean_text == "a" + P + "b"
    assert got[1].clean_text == "" and got[1].n_dropped == 2
    assert got[2].n_paras == 0 and got[2].clean_text == ""


def test_vocab_growth_hand_case(spark):
    """4 docs ids 0..3: checkpoints at ceil(4j/10) docs. Vocab after
    doc0={a,b}, doc1 adds c, doc3 adds d — monotone, exact."""
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, "a c"), (3, "d")],
        "doc_id bigint, text string",
    )
    got = {r.checkpoint: (r.n_docs, r.vocab_size)
           for r in curation.vocab_growth(docs).collect()}
    assert got[1] == (1, 2)   # cutoff 1: doc 0 only -> {a,b}
    assert got[3] == (2, 3)   # cutoff 2: +c
    assert got[8] == (4, 4)   # cutoff 4: +d
    assert got[10] == (4, 4)
    sizes = [got[j][1] for j in sorted(got)]
    assert sizes == sorted(sizes)  # growth is monotone


def test_freq_spectrum_hand_case(spark):
    """Corpus a×3 b×1 c×1: N_1=2 (b,c), N_3=1 (a)."""
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id bigint, text string"
    )
    got = {r.occurrences: (r.n_types, r.type_tokens)
           for r in curation.freq_spectrum(docs).collect()}
    assert got == {1: (2, 2), 3: (1, 3)}


def test_line_dedup_scrub_keep_first_order(spark):
    """[A, S, B, S, A] -> [A, S, B]; empty doc -> one '' line kept."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        line_dedup_scrub,
    )

    rows = [
        (1, "A\nShare\nB\nShare\nA"),
        (2, "x\nx\nx\nx"),
        (3, ""),
        (4, "only"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1].clean_text == "A\nShare\nB"
    assert (out[1].n_lines, out[1].n_kept, out[1].n_dropped) == (5, 3, 2)
    assert out[2].clean_text == "x" and out[2].n_dropped == 3
    assert out[3].clean_text == "" and out[3].n_lines == 1 and out[3].n_kept == 1
    assert out[4].clean_text == "only" and out[4].n_dropped == 0


def test_line_dedup_scrub_is_map_only(spark):
    """Zero exchanges: the scrub must ride the scan."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        line_dedup_scrub,
    )

    df = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = (
        line_dedup_scrub(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_compression_signal_tails(spark):
    """Templated text compresses hard (repetitive), base64-ish noise
    barely (incompressible), prose sits between; empty doc -> 0.0."""
    import base64
    import hashlib

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        compression_signal,
    )

    noise = base64.b64encode(
        b"".join(hashlib.sha256(bytes([i])).digest() for i in range(64))
    ).decode()
    rows = [
        (1, "buy now click here " * 200),
        (2, noise),
        (3, "The quick brown fox jumps over the lazy dog near the bank "
            "of the river while the miller grinds his grain in peace."),
        (4, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in compression_signal(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1].repetitive and not out[1].incompressible
    assert out[1].ratio < 0.05
    assert out[2].incompressible and not out[2].repetitive
    assert out[2].ratio > 0.72
    # short prose measures ~0.82 from zlib header overhead alone —
    # the min_flag_bytes guard is what keeps it unflagged
    assert out[3].ratio > 0.72 and not out[3].incompressible
    assert not out[3].repetitive
    assert out[4].ratio == 0.0 and out[4].raw_bytes == 0
    assert not out[4].repetitive and not out[4].incompressible
