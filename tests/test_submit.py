"""End-to-end ``spark-submit --py-files`` packaging proof (north_rule:
"ships as spark-submit --py-files on a multi-executor cluster";
SURVEY.md §7 M8).

Builds engine.zip with tools/make_pyfiles.py, then launches a REAL
``spark-submit`` subprocess running ``job.py`` from the zip against a
pages parquet written from the sf0.001 clean corpus — no repo on
sys.path, cwd outside the repo, so every import must resolve from the
--py-files artifact. The crawl result is compared row-for-row against
the in-process library crawl with the same config.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.001"
SEED = "https://host0.example/page/0"
MAX_ITER = 3


def _spark_submit() -> str | None:
    from shutil import which

    return which("spark-submit")


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
        CrawlConfig,
        crawl,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import (
        pages as pagesrc,
    )

    pages = pagesrc.synth_clean_pages(spark, SF_SMALL)
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(pages_path)

    zip_path = build(str(tmp_path / "engine.zip"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files only
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "go_crawler_20251102_011312_url_crawlerv10_twotier_spark", "job.py"),
            "--pages", pages_path,
            "--seed", SEED,
            "--max-iterations", str(MAX_ITER),
            "--output", out_dir,
        ],
        cwd=str(tmp_path),  # NOT the repo — no accidental source imports
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"

    # the job prints one JSON summary line on stdout
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            summary = json.loads(line)
    assert summary is not None, proc.stdout[-2000:]
    assert summary["seen"] > 1  # crawl expanded past the seed

    # byte-for-byte equivalence with the in-process library crawl
    seeds = spark.createDataFrame([(SEED, 0)], "url string, depth int")
    ref = crawl(spark, pages, seeds, CrawlConfig(max_iterations=MAX_ITER))
    got = spark.read.parquet(f"{out_dir}/seen").select("url_norm", "depth")
    want = ref.seen.select("url_norm", "depth")
    assert got.count() == summary["seen"]
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
