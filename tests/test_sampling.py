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
