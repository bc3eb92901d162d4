"""Text analysis operators."""

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions import textstats as T


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")


def test_lang_id(spark):
    texts = [
        "the cat and the dog of the house is big",
        "der Hund und die Katze ist hier",
        "le chat et la maison est grande les arbres",
        "el perro y los gatos es grande las casas",
        "xyz qqq zzz",
    ]
    out = [r.lang for r in _df(spark, texts).select(T.lang_id("text").alias("lang")).collect()]
    assert out == ["en", "de", "fr", "es", "und"]


def test_token_counts(spark):
    df = _df(spark, ["a b  c", "", "   ", "don't stop, won't stop!"])
    rows = df.select(
        T.token_count_ws("text").alias("ws"), T.token_count_bpe("text").alias("bpe")
    ).collect()
    assert [r.ws for r in rows] == [3, 0, 0, 4]
    # bpe-ish: don ' t stop , won ' t stop ! = 10
    assert rows[3].bpe == 10


def test_quality_score_bounds(spark):
    df = _df(spark, ["", "the and of to is. " * 30, "zz"])
    rows = df.select(T.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    assert rows[1].q > rows[2].q


def test_fingerprint_whitespace_invariant(spark):
    df = _df(spark, ["a  b\tc", "a b c", "a b  d"])
    fps = [r.fp for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


# ---------------------------------------------------------------------------
# quality_filter
# ---------------------------------------------------------------------------


def _qdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_quality_filter_rules_and_reason_order(spark):
    good = "the and of to is " + " ".join(f"word{i}" for i in range(30))
    rows = {
        r.doc_id: r
        for r in T.quality_filter(
            _qdocs(
                spark,
                [
                    good,                     # passes everything
                    "the and of to is",       # too few words -> min_words
                    "xylophone quartz " * 20, # no stopwords -> stopwords
                    "the is " + "word " * 60, # heavy repeats -> repetition
                ],
            )
        ).collect()
    }
    assert rows[0].keep and rows[0].reason == "ok"
    assert not rows[1].keep and rows[1].reason == "min_words"
    assert not rows[2].keep and rows[2].reason == "stopwords"
    assert not rows[3].keep and rows[3].reason == "repetition"
    # reason is the FIRST failing rule: doc 1 also fails stopwords? no —
    # it has 5 stop hits; build one failing min_words AND repetition
    multi = T.quality_filter(_qdocs(spark, ["the the the the"])).collect()[0]
    assert multi.reason == "min_words"  # ordered before repetition


def test_quality_filter_empty_text(spark):
    r = T.quality_filter(_qdocs(spark, [""])).collect()[0]
    assert r.n_words == 0 and not r.keep and r.reason == "min_words"
    assert r.distinct_ratio == 0.0 and r.mean_wl == 0.0


def test_redact_pii_sequence_and_counts(spark):
    """Sequential scrub: placeholders never re-match later rules, and
    each kind counts exactly its occurrences."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (0, "mail a.b+c@my-host.org and d@e.io please"),
            (1, "server 192.168.0.1 and 10.0.0.7 up"),
            (2, "call +1 (555) 123-4567 or 020 7946 0958 now"),
            (3, "clean text only"),
            (4, "x@y.com at 10.0.0.1 tel +44 123456789 mix"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert (got[0].n_email, got[0].clean_text) == (
        2,
        "mail <EMAIL> and <EMAIL> please",
    )
    assert (got[1].n_ipv4, got[1].clean_text) == (
        2,
        "server <IP> and <IP> up",
    )
    assert got[2].n_phone == 2
    assert got[2].clean_text == "call <PHONE> or <PHONE> now"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 0)
    assert got[4].clean_text == "<EMAIL> at <IP> tel <PHONE> mix"


def test_normalize_text_semantics(spark):
    """Pin the full canonicalization contract, including the NFC cases
    the shared-SQL gate fixture cannot portably express (decomposed
    accents, non-Latin scripts) and the ordering subtlety that a
    control char BETWEEN spaces yields one space, not two."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        normalize_text,
    )

    docs = spark.createDataFrame(
        [
            (0, "café menu"),  # decomposed -> composed é (5->4 chars)
            (1, "a \x07 b"),  # control between spaces -> ONE space
            (2, "x​Y﻿z"),  # zero-width stripped, tokens fuse
            (3, "  tabs\t\tand\nnewlines  "),
            (4, "nb sp  run"),  # NBSP -> space, runs collapse
            (5, "already clean"),
            (6, "का café"),  # NFC-stable Devanagari + composed é
            (7, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert got[0].norm_text == "café menu"
    assert (got[0].n_before, got[0].n_after, got[0].changed) == (10, 9, True)
    assert got[1].norm_text == "a b"
    assert got[2].norm_text == "xYz"
    assert got[3].norm_text == "tabs and newlines"
    assert got[4].norm_text == "nb sp run"
    assert got[5].norm_text == "already clean" and not got[5].changed
    assert got[6].norm_text == "का café" and not got[6].changed
    assert got[7].norm_text == "" and not got[7].changed


def test_normalize_text_idempotent(spark):
    """normalize(normalize(x)) == normalize(x) — the property every
    downstream text-keyed operator relies on."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        normalize_text,
    )

    docs = spark.createDataFrame(
        [
            (0, " a b \tć \x01d​ "),
            (1, "plain"),
        ],
        "doc_id long, text string",
    )
    once = normalize_text(docs)
    twice = normalize_text(once, text_col="norm_text")
    pairs = (
        once.alias("a")
        .join(twice.alias("b"), "doc_id")
        .select("a.norm_text", "b.norm_text")
        .collect()
    )
    assert all(p[0] == p[1] for p in pairs)


def test_fingerprint_normalized_unifies_renderings(spark):
    """Two renderings of the same content (padding, NBSP, controls,
    zero-width) must share one fp_norm while their fp_raw differ —
    the rendering-independent dedup-key contract."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        fingerprint,
        normalize_text,
    )
    from pyspark.sql import functions as F

    base = "the quick brown fox"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, "  the quick\tbrown  fox  "),  # padding/tabs
            (2, "the quick brown fox"),  # NBSP
            (3, "the quick\x07 brown fox"),  # C0 control (stripped)
            (4, "the quick brown​ fox"),  # zero-width
        ],
        "doc_id long, text string",
    )
    docs = docs.withColumn("fp_raw", fingerprint("text"))
    n = normalize_text(docs, keep=("fp_raw",))
    rows = n.select(
        "doc_id", "fp_raw", fingerprint("norm_text").alias("fp_norm")
    ).collect()
    got = {r.doc_id: r for r in rows}
    assert len({r.fp_norm for r in rows}) == 1  # all unify
    for i in (1, 2, 3, 4):
        assert got[i].fp_raw != got[0].fp_raw  # raw keys miss
        assert got[i].fp_norm == got[0].fp_norm


def test_script_profile_counts_and_dominant(spark):
    """Per-block counts, the earlier-class tie-break, and the 'none'
    fallback for docs with no letters in any block."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        script_profile,
    )

    docs = spark.createDataFrame(
        [
            (0, "hello Привет"),  # 5 latin vs 6 cyrillic
            (1, "abc где"),  # 3 vs 3 tie -> latin (earlier class)
            (2, "你好世界 ok"),  # cjk dominates
            (3, "123 .,!?"),  # no letters -> none
            (4, ""),  # empty -> none
            (5, "مرحبا γεια"),  # 5 arabic vs 4 greek
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs).collect()}
    assert (got[0].n_latin, got[0].n_cyrillic, got[0].dominant) == (5, 6, "cyrillic")
    assert (got[1].n_latin, got[1].n_cyrillic, got[1].dominant) == (3, 3, "latin")
    assert (got[2].n_cjk, got[2].dominant) == (4, "cjk")
    assert got[3].dominant == "none" and got[3].n_latin == 0
    assert got[4].dominant == "none" and got[4].n_chars == 0
    assert (got[5].n_arabic, got[5].n_greek, got[5].dominant) == (5, 4, "arabic")


def test_luhn_stats_hand_cases(spark):
    """Known PANs validate, off-by-one fails, short runs are not
    candidates, a 26-digit run yields one greedy 19-digit candidate."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        luhn_stats,
    )

    rows = [
        (1, "pay 4111111111111111 now"),          # valid 16
        (2, "ref 4111111111111112 x"),            # invalid 16
        (3, "id 123456789012 short"),             # 12 digits: no candidate
        (4, "cards 4532015112830366 and 7992739871300 and 1234567890123456789"),
        (5, "ts 20240101120000123456789012"),     # one 19-digit candidate
        (6, "no digits at all"),
        (7, None),
    ]
    out = {
        r["doc_id"]: r
        for r in luhn_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (out[1].n_digit_runs, out[1].n_luhn_valid, out[1].has_pan) == (1, 1, True)
    assert (out[2].n_digit_runs, out[2].n_luhn_valid, out[2].has_pan) == (1, 0, False)
    assert out[3].n_digit_runs == 0 and not out[3].has_pan
    # valid 16 + valid 13 + invalid 19
    assert (out[4].n_digit_runs, out[4].n_luhn_valid) == (3, 2)
    assert out[5].n_digit_runs == 1  # greedy 19-digit prefix, not 26
    assert out[6].n_digit_runs == 0
    assert out[7].n_digit_runs == 0 and not out[7].has_pan
