"""End-to-end pipeline composition + mid-pipeline resume (VERDICT r03
next-round item #1): the nine stages run as one driven job, and a
pipeline killed after stage k resumes from its committed stage outputs
to the IDENTICAL shard manifest an uninterrupted run produces."""

from __future__ import annotations

import os

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.pipeline import (
    PipelineStopped,
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
