"""Deterministic stratified training-mix sampler."""

import hashlib

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import sampling


def _docs(spark, n=200):
    langs = ["en", "de", "fr", "es", "zh", "xx"]
    return spark.createDataFrame(
        [(i, langs[i % len(langs)]) for i in range(n)], "doc_id long, lang string"
    )


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1000


def test_mix_sample_matches_reference_hash(spark):
    rows = sampling.training_mix_sample(_docs(spark)).collect()
    for r in rows:
        assert r.bucket == _bucket(r.doc_id), r
        rate = sampling.DEFAULT_MIX_PERMILLE.get(r.stratum, sampling.DEFAULT_PERMILLE)
        assert r.rate_permille == rate
        assert r.keep == (r.bucket < rate)
        assert abs(r.weight - round(1000.0 / rate, 6)) < 1e-9


def test_mix_sample_deterministic_across_partitioning(spark):
    a = sampling.training_mix_sample(_docs(spark)).collect()
    b = sampling.training_mix_sample(_docs(spark).repartition(7)).collect()
    assert sorted((r.doc_id, r.keep) for r in a) == sorted(
        (r.doc_id, r.keep) for r in b
    )


def test_mix_sample_unknown_stratum_default_rate(spark):
    rows = sampling.training_mix_sample(_docs(spark)).collect()
    xx = [r for r in rows if r.stratum == "xx"]
    assert xx and all(r.rate_permille == sampling.DEFAULT_PERMILLE for r in xx)


def test_mix_sample_rate_convergence(spark):
    # uniform hash: realized keep-rate per stratum tracks the target
    docs = spark.createDataFrame(
        [(i, "en") for i in range(5000)], "doc_id long, lang string"
    )
    rows = sampling.training_mix_sample(
        docs, rates_permille={"en": 500}
    ).collect()
    kept = sum(r.keep for r in rows)
    assert abs(kept / 5000 - 0.5) < 0.03


def test_domain_cap_sample_cap_and_order(spark):
    """Top-K per host by (quality DESC, doc_id): cap respected, the
    mega-host's dropped rows survive with keep=False/rank NULL, and a
    quality tie breaks by doc_id."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sampling import (
        domain_cap_sample,
    )

    rows = [(i, "mega.example", float(i % 4)) for i in range(40)]
    rows += [(100, "tiny.example", 0.5), (101, "tiny.example", 0.5)]
    docs = spark.createDataFrame(rows, "doc_id long, host string, quality double")
    out = {r.doc_id: r for r in domain_cap_sample(docs, max_per_host=5).collect()}
    assert len(out) == 42  # full decision surface
    kept_mega = sorted(
        (r.rank, r.doc_id) for r in out.values()
        if r.host == "mega.example" and r.keep
    )
    # quality 3.0 docs are ids 3,7,11,...; top-5 by (q desc, id asc)
    assert kept_mega == [(1, 3), (2, 7), (3, 11), (4, 15), (5, 19)]
    assert all(
        not r.keep and r.rank is None
        for r in out.values()
        if r.host == "mega.example" and r.doc_id not in (3, 7, 11, 15, 19)
    )
    # tie on quality 0.5: lower doc_id ranks first
    assert out[100].rank == 1 and out[101].rank == 2


def test_domain_cap_sample_salting_invariant(spark):
    """The salted two-phase result is identical to the naive single
    window (n_salts=1) on a skewed corpus."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.sampling import (
        domain_cap_sample,
    )

    rows = [
        (i, "m.example" if i % 3 else f"h{i % 7}.example", float((i * 37) % 11))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, quality double")
    a = sorted(map(tuple, domain_cap_sample(docs, max_per_host=4, n_salts=16).collect()))
    b = sorted(map(tuple, domain_cap_sample(docs, max_per_host=4, n_salts=1).collect()))
    assert a == b

def test_lang_temperature_thresholds_and_buckets(spark):
    """alpha=0.5: threshold_l = floor(1e6 * sqrt(n_min/n_l)), the
    rarest language is kept whole, buckets match the md5 reference."""
    import math

    rows = [(i, "en") for i in range(400)]
    rows += [(1000 + i, "de") for i in range(100)]
    rows += [(2000 + i, "sw") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.lang_temperature_sample(docs).collect()
    assert len(out) == 525  # full decision surface
    counts = {"en": 400, "de": 100, "sw": 25}
    for r in out:
        exp_t = max(int(math.floor(1e6 * math.sqrt(25 / counts[r.lang]))), 1)
        assert r.n_lang == counts[r.lang]
        assert r.threshold == exp_t, (r.lang, r.threshold, exp_t)
        b = int(
            hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16
        ) % 1_000_000
        assert r.bucket == b
        assert r.keep == (b < exp_t)
        assert abs(r.weight - round(1e6 / exp_t, 6)) < 1e-9
    # rarest language: threshold = B, every doc kept
    assert all(r.keep for r in out if r.lang == "sw")


def test_lang_temperature_alpha_extremes(spark):
    """alpha=1 keeps everything (no rebalance); alpha=0 equalizes
    expected counts (keep rate = n_min/n_l)."""
    rows = [(i, "en") for i in range(400)] + [(500 + i, "sw") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    flat = sampling.lang_temperature_sample(docs, alpha=1.0).collect()
    assert all(r.threshold == 1_000_000 and r.keep for r in flat)
    eq = {
        r.lang: r.threshold
        for r in sampling.lang_temperature_sample(docs, alpha=0.0).collect()
    }
    assert eq["sw"] == 1_000_000 and eq["en"] == 62_500  # 25/400 * 1e6


def test_lang_temperature_deterministic_across_partitioning(spark):
    docs = _docs(spark, 300)
    a = sorted(map(tuple, sampling.lang_temperature_sample(docs).collect()))
    b = sorted(
        map(tuple, sampling.lang_temperature_sample(docs.repartition(13)).collect())
    )
    assert a == b


def _dsir_expected(raw_texts, tgt_texts, n_buckets=10_000):
    """Reference DSIR in plain Python: same grams, same md5 buckets,
    same fixed-association micro-nat chain."""
    import math

    def grams(t):
        toks = [w for w in t.lower().split() if w]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets

    r_cnt, t_cnt = {}, {}
    for t in raw_texts.values():
        for g in grams(t):
            r_cnt[bucket(g)] = r_cnt.get(bucket(g), 0) + 1
    for t in tgt_texts.values():
        for g in grams(t):
            t_cnt[bucket(g)] = t_cnt.get(bucket(g), 0) + 1
    r_tot, t_tot = sum(r_cnt.values()), sum(t_cnt.values())
    lr = {
        b: round(
            1e6
            * (
                math.log(t_cnt.get(b, 0) + 1.0)
                - math.log(t_tot + float(n_buckets))
                - math.log(rc + 1.0)
                + math.log(r_tot + float(n_buckets))
            )
        )
        for b, rc in r_cnt.items()
    }
    return {
        d: (sum(lr[bucket(g)] for g in grams(t)), len(grams(t)))
        for d, t in raw_texts.items()
    }


def test_dsir_importance_closed_form(spark):
    """Spark result equals the plain-Python reference on a corpus where
    doc 0 IS the target slice — target-like docs must outscore the
    rest, and gram counts include bigrams (k tokens -> 2k-1 grams)."""
    texts = {
        0: "spark shuffle spark join",
        1: "spark shuffle spark join",   # identical to the target doc
        2: "cats purr on the warm couch",
        3: "one",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    target = docs.filter("doc_id = 0")
    out = {
        r.doc_id: (r.score_micro, r.n_grams)
        for r in sampling.dsir_importance(docs, target).collect()
    }
    exp = _dsir_expected(texts, {0: texts[0]})
    assert out == exp
    assert out[3][1] == 1 and out[0][1] == 7  # 4 tokens -> 7 grams
    # per-gram-normalized target affinity: the target twin beats the
    # off-topic doc
    assert out[1][0] / out[1][1] > out[2][0] / out[2][1]


def test_dsir_importance_empty_doc_full_surface(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, ""), (2, None)], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.score_micro, r.n_grams)
        for r in sampling.dsir_importance(docs, docs.filter("doc_id = 0")).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[1] == (0, 0) and out[2] == (0, 0)


def test_dsir_importance_partitioning_invariant(spark):
    rows = [(i, f"tok{i % 13} tok{(i * 7) % 13} common word") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = docs.filter("doc_id % 10 = 0")
    a = sorted(map(tuple, sampling.dsir_importance(docs, tgt).collect()))
    b = sorted(
        map(
            tuple,
            sampling.dsir_importance(docs.repartition(17), tgt.repartition(3)).collect(),
        )
    )
    assert a == b


def _gumbel_micro(doc_id: int, temperature: float = 1.0) -> int:
    import math

    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000
    u = (float(b) + 0.5) / 1_000_000.0
    return round(1_000_000.0 * temperature * -math.log(-math.log(u)))


def test_importance_resample_matches_reference_topk(spark):
    """Keep set == the Python reference's top-k by (score+gumbel,
    doc_id); exactly k rows keep; full decision surface preserved."""
    rows = [(i, (i * 9173) % 2_000_000 - 1_000_000) for i in range(300)]
    scored = spark.createDataFrame(rows, "doc_id long, score_micro long")
    out = sampling.importance_resample(scored, k=40).collect()
    assert len(out) == 300
    ref = sorted(
        ((s + _gumbel_micro(d), d) for d, s in rows),
        key=lambda t: (-t[0], t[1]),
    )
    ref_keep = {d for _, d in ref[:40]}
    for r in out:
        assert r.g_micro == _gumbel_micro(r.doc_id)
        assert r.key_micro == r.score_micro + r.g_micro
        assert r.keep == (r.doc_id in ref_keep), r
    assert sum(r.keep for r in out) == 40


def test_importance_resample_biases_toward_high_scores(spark):
    """With a decisive score gap (>> gumbel spread) the kept set IS the
    high-score block — the resample respects the importance weights."""
    rows = [(i, 100_000_000 if i < 50 else 0) for i in range(500)]
    scored = spark.createDataFrame(rows, "doc_id long, score_micro long")
    kept = {
        r.doc_id
        for r in sampling.importance_resample(scored, k=50).collect()
        if r.keep
    }
    assert kept == set(range(50))


def test_importance_resample_k_exceeds_n_keeps_all(spark):
    scored = spark.createDataFrame(
        [(i, i) for i in range(7)], "doc_id long, score_micro long"
    )
    out = sampling.importance_resample(scored, k=100).collect()
    assert len(out) == 7 and all(r.keep for r in out)


def test_importance_resample_partitioning_invariant(spark):
    rows = [(i, (i * 31) % 1000) for i in range(200)]
    scored = spark.createDataFrame(rows, "doc_id long, score_micro long")
    a = sorted(map(tuple, sampling.importance_resample(scored, k=25).collect()))
    b = sorted(
        map(
            tuple,
            sampling.importance_resample(scored.repartition(11), k=25).collect(),
        )
    )
    assert a == b
