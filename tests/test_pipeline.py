"""End-to-end pipeline composition + mid-pipeline resume (VERDICT r03
next-round item #1): the nine stages run as one driven job, and a
pipeline killed after stage k resumes from its committed stage outputs
to the IDENTICAL shard manifest an uninterrupted run produces."""

from __future__ import annotations

import os

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.pipeline import (
    PipelineStopped,
    run_incremental_pipeline,
    run_training_pipeline,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import (
    pages as pagesrc,
)


def _inputs(spark):
    pages = pagesrc.synth_clean_pages(spark, "/root/testdata/sf0.001")
    seeds = spark.sql(pagesrc.seeds_sql())
    return pages, seeds


def _manifest_rows(res):
    return sorted(tuple(r) for r in res.manifest.collect())


@pytest.fixture(scope="module")
def uninterrupted(spark, tmp_path_factory):
    pages, seeds = _inputs(spark)
    wd = str(tmp_path_factory.mktemp("pipe_full"))
    return run_training_pipeline(
        spark, pages, seeds, wd, max_records_per_file=100
    )


def test_pipeline_stages_and_funnel(uninterrupted):
    """All nine stages run, in order, each certified from its on-disk
    output; the funnel only narrows after extraction (every later
    stage is a filter/aggregation of the previous)."""
    names = [s.name for s in uninterrupted.stages]
    assert names == [
        "crawl", "tier2_extract", "normalize", "quality_filter",
        "exact_dedup", "dedup_clusters", "corpus_refine",
        "sequence_pack", "training_shards",
    ]
    assert all(not s.resumed for s in uninterrupted.stages)
    rows = {s.name: (s.rows_in, s.rows_out) for s in uninterrupted.stages}
    assert rows["crawl"][1] > 0
    assert rows["tier2_extract"][1] == rows["crawl"][1]  # all pages hit
    for name in (
        "quality_filter", "exact_dedup", "dedup_clusters", "corpus_refine"
    ):
        rin, rout = rows[name]
        assert 0 < rout <= rin
    # instrumentation is real: walls and heap peaks are nonzero
    assert all(s.wall_s > 0 for s in uninterrupted.stages)
    assert all(s.peak_heap_mb > 0 for s in uninterrupted.stages)
    # crawl stage records its own throughput facts
    crawl_extra = uninterrupted.stages[0].extra
    assert crawl_extra["urls_fetched"] > 0 and crawl_extra["iterations"] > 0
    # pack audit rides the marker
    pack_extra = uninterrupted.stages[7].extra
    assert pack_extra["n_sequences"] > 0
    assert 0 <= pack_extra["pad_tokens"] < 256 * (pack_extra["n_sequences"])


def test_pipeline_resume_identical_manifest(spark, tmp_path, uninterrupted):
    """Kill after stage 4 (quality_filter committed, dedup never ran),
    then re-run: stages 1-4 resume from their markers without
    recompute, 5-9 run fresh, and the final shard manifest is
    row-identical to the uninterrupted run's."""
    pages, seeds = _inputs(spark)
    wd = str(tmp_path / "pipe_resume")
    with pytest.raises(PipelineStopped) as ei:
        run_training_pipeline(
            spark, pages, seeds, wd, max_records_per_file=100, stop_after=4
        )
    assert ei.value.after_stage == 4
    assert len(ei.value.stages) == 4
    # the first four stage dirs are committed, the rest absent
    committed = sorted(
        d for d in os.listdir(wd)
        if os.path.exists(os.path.join(wd, d, "_PIPELINE_COMMIT.json"))
    )
    assert committed == [
        "01_crawl", "02_tier2_extract", "03_normalize", "04_quality_filter",
    ]

    res = run_training_pipeline(
        spark, pages, seeds, wd, max_records_per_file=100
    )
    flags = [(s.name, s.resumed) for s in res.stages]
    assert flags == [
        ("crawl", True), ("tier2_extract", True), ("normalize", True),
        ("quality_filter", True), ("exact_dedup", False),
        ("dedup_clusters", False), ("corpus_refine", False),
        ("sequence_pack", False), ("training_shards", False),
    ]
    assert _manifest_rows(res) == _manifest_rows(uninterrupted)
    # resumed stage stats are the ORIGINAL run's facts, not zeros
    assert res.stages[0].extra["urls_fetched"] > 0


def test_incremental_recrawl_matches_full_run(
    spark, tmp_path_factory, uninterrupted
):
    """The incremental pipeline over a mutated corpus (prior = the
    uninterrupted v1 run) produces the IDENTICAL shard manifest a full
    run over the same v2 corpus produces, while pushing only the
    changed documents through the per-document stages."""
    pages, seeds = _inputs(spark)
    v2 = pagesrc.recrawl_v2(pages)

    full_wd = str(tmp_path_factory.mktemp("pipe_full_v2"))
    full_v2 = run_training_pipeline(
        spark, v2, seeds, full_wd, max_records_per_file=100
    )

    prior_wd = os.path.dirname(uninterrupted.shards_dir)
    inc_wd = str(tmp_path_factory.mktemp("pipe_inc_v2"))
    inc = run_incremental_pipeline(
        spark, v2, seeds, prior_wd, inc_wd, max_records_per_file=100
    )

    assert [s.name for s in inc.stages] == [
        "crawl", "tier2_diff", "normalize_delta", "quality_delta",
        "merge_clean", "exact_dedup", "dedup_clusters", "corpus_refine",
        "sequence_pack", "training_shards",
    ]
    # the contract: identical final shards, full vs incremental
    assert _manifest_rows(inc) == _manifest_rows(full_v2)

    # the efficiency claim: per-document stages saw only the delta
    diff = inc.stages[1].extra
    assert diff["n_new_or_changed"] > 0
    assert diff["n_changed"] > 0
    assert diff["n_new"] == 0  # the mutation adds no pages
    assert diff["n_removed"] > 0
    assert diff["n_unchanged"] > 0
    assert diff["reuse_fraction"] > 0.5
    rows = {s.name: (s.rows_in, s.rows_out) for s in inc.stages}
    assert rows["normalize_delta"][0] == diff["n_new_or_changed"]
    assert rows["normalize_delta"][0] < rows["crawl"][1]

    # merged clean corpus row-identical to the full v2 run's stage 4
    full_clean = sorted(
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(full_wd, "04_quality_filter")
        )
        .select("doc_id", "url", "host", "text")
        .collect()
    )
    inc_clean = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(inc_wd, "05_merge_clean"))
        .select("doc_id", "url", "host", "text")
        .collect()
    )
    assert inc_clean == full_clean


def test_incremental_noop_recrawl_reuses_everything(
    spark, tmp_path_factory, uninterrupted
):
    """Recrawling the UNCHANGED corpus: zero documents re-enter the
    per-document stages, and the shards match the prior run's."""
    pages, seeds = _inputs(spark)
    prior_wd = os.path.dirname(uninterrupted.shards_dir)
    inc_wd = str(tmp_path_factory.mktemp("pipe_inc_noop"))
    inc = run_incremental_pipeline(
        spark, pages, seeds, prior_wd, inc_wd, max_records_per_file=100
    )
    diff = inc.stages[1].extra
    assert diff["n_new_or_changed"] == 0
    assert diff["n_removed"] == 0
    assert diff["reuse_fraction"] == 1.0
    assert _manifest_rows(inc) == _manifest_rows(uninterrupted)


def test_pipeline_rerun_is_fully_cached(spark, tmp_path_factory, uninterrupted):
    """A second run over a completed work_dir resumes every stage and
    reproduces the manifest without recomputing anything."""
    pages, seeds = _inputs(spark)
    # reuse the uninterrupted run's work dir: every marker present
    wd = os.path.dirname(
        os.path.join(uninterrupted.shards_dir)
    )
    res = run_training_pipeline(
        spark, pages, seeds, wd, max_records_per_file=100
    )
    assert all(s.resumed for s in res.stages)
    assert _manifest_rows(res) == _manifest_rows(uninterrupted)


def test_pipeline_optional_paragraph_dedup_stage(spark, tmp_path):
    """para_dedup=True inserts the corpus-global paragraph-dedup stage
    between tier-2 extract and normalize (before whitespace collapse
    erases line boundaries): ten stages, doc count preserved (it edits
    text, never drops docs), and the downstream funnel still runs to a
    shard manifest."""
    pages, seeds = _inputs(spark)
    res = run_training_pipeline(
        spark,
        pages,
        seeds,
        str(tmp_path / "pd"),
        max_records_per_file=100,
        para_dedup=True,
    )
    names = [s.name for s in res.stages]
    assert names == [
        "crawl", "tier2_extract", "paragraph_dedup", "normalize",
        "quality_filter", "exact_dedup", "dedup_clusters",
        "corpus_refine", "sequence_pack", "training_shards",
    ]
    rows = {s.name: (s.rows_in, s.rows_out) for s in res.stages}
    # paragraph dedup rewrites text but keeps every doc row
    assert rows["paragraph_dedup"] == (
        rows["tier2_extract"][1], rows["tier2_extract"][1]
    )
    assert res.manifest.count() > 0


def test_pipeline_temperature_mix_stage(spark, tmp_path):
    """mix_alpha=0.5 swaps the refine sampler from the policy rate
    table to the corpus-derived temperature mix: same nine stages, and
    the refined (doc_id, stratum, weight) set equals
    lang_temperature_sample applied independently to the committed
    dedup_clusters stage output."""
    from pyspark.sql import functions as F

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.textstats import (
        lang_id,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import (
        sampling,
    )

    pages, seeds = _inputs(spark)
    wd = str(tmp_path / "tm")
    res = run_training_pipeline(
        spark, pages, seeds, wd, max_records_per_file=100, mix_alpha=0.5
    )
    assert [s.name for s in res.stages][-3:] == [
        "corpus_refine", "sequence_pack", "training_shards",
    ]
    refined = spark.read.parquet(os.path.join(wd, "07_corpus_refine"))
    canon = spark.read.parquet(os.path.join(wd, "06_dedup_clusters"))
    exp = (
        sampling.lang_temperature_sample(
            canon.withColumn("lang", lang_id(F.col("text")))
        )
        .filter("keep")
        .select("doc_id", F.col("lang").alias("stratum"), "weight")
    )
    got = {tuple(r) for r in refined.select("doc_id", "stratum", "weight").collect()}
    want = {tuple(r) for r in exp.collect()}
    assert got == want and got
    # the rarest surviving language is kept whole: some weight == 1.0
    assert any(w == 1.0 for _, _, w in got)


def test_pipeline_soft404_and_line_scrub_stages(spark, tmp_path):
    """drop_soft404 + line_scrub insert their stages in order (2a
    before 2c, both before normalize); soft404 only DROPS rows, the
    scrub only REWRITES text; the committed line_scrub parquet equals
    line_dedup_scrub applied to the committed stage before it; the
    funnel still reaches a shard manifest."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.curation import (
        line_dedup_scrub,
    )

    pages, seeds = _inputs(spark)
    wd = tmp_path / "s4"
    res = run_training_pipeline(
        spark,
        pages,
        seeds,
        str(wd),
        max_records_per_file=100,
        drop_soft404=True,
        line_scrub=True,
    )
    names = [s.name for s in res.stages]
    assert names == [
        "crawl", "tier2_extract", "soft404_filter", "line_scrub",
        "normalize", "quality_filter", "exact_dedup", "dedup_clusters",
        "corpus_refine", "sequence_pack", "training_shards",
    ]
    rows = {s.name: (s.rows_in, s.rows_out) for s in res.stages}
    assert rows["soft404_filter"][1] <= rows["soft404_filter"][0]
    # line scrub preserves every doc row
    assert rows["line_scrub"] == (
        rows["soft404_filter"][1], rows["soft404_filter"][1]
    )
    assert res.manifest.count() > 0
    # the committed stage output IS the operator applied to its input
    import glob

    from pyspark.sql import functions as F

    def stage_dir(name):
        m = glob.glob(str(wd / f"*_{name}"))
        assert len(m) == 1, m
        return m[0]

    prev = spark.read.parquet(stage_dir("soft404_filter"))
    got = spark.read.parquet(stage_dir("line_scrub"))
    want = line_dedup_scrub(prev, keep=("url", "n_bytes", "body_xxh")).select(
        "doc_id", "url", F.col("clean_text").alias("text"), "n_bytes", "body_xxh"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_pipeline_resume_identical_with_all_optional_stages(spark, tmp_path):
    """The twelve-stage variant (soft-404 filter + corpus-global
    paragraph dedup + line scrub all ON): kill after stage 5
    (paragraph_dedup committed, line_scrub never ran), resume, and the
    shard manifest is row-identical to the uninterrupted twelve-stage
    run — the VERDICT r04 #7 'resume still byte-identical' check for
    the optional-stage composition."""
    kw = dict(
        max_records_per_file=100,
        drop_soft404=True,
        para_dedup=True,
        line_scrub=True,
    )
    pages, seeds = _inputs(spark)
    full = run_training_pipeline(
        spark, pages, seeds, str(tmp_path / "opt_full"), **kw
    )
    assert [s.name for s in full.stages] == [
        "crawl", "tier2_extract", "soft404_filter", "paragraph_dedup",
        "line_scrub", "normalize", "quality_filter", "exact_dedup",
        "dedup_clusters", "corpus_refine", "sequence_pack",
        "training_shards",
    ]

    wd = str(tmp_path / "opt_resume")
    with pytest.raises(PipelineStopped) as ei:
        run_training_pipeline(spark, pages, seeds, wd, stop_after=4, **kw)
    assert ei.value.after_stage == 4

    res = run_training_pipeline(spark, pages, seeds, wd, **kw)
    flags = [(s.name, s.resumed) for s in res.stages]
    assert [f[1] for f in flags[:4]] == [True] * 4
    assert [f[1] for f in flags[4:]] == [False] * 8
    assert _manifest_rows(res) == _manifest_rows(full)
