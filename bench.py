"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric mirrors BASELINE.json: URLs scheduled+fetched per
second over the full frontier-BFS crawl (the flagship), with per-query
wall times for the rest of the operator surface. ``value`` is the total
wall-clock of all benched queries.

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N executors;
sandbox stand-in = local[8] vs local[32] on identical input):

    python bench.py --scaling     # runs the crawl at 8 and 32 cores in
                                  # fresh subprocesses, prints both
                                  # throughputs + efficiency

Results are recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# queries benched besides the flagship crawl (name -> force-action)
BENCH_QUERIES = [
    "url_normalize_compat",
    "url_canonicalize",
    "route_decision",
    "extract_links_fast",
    "politeness_budget",
    "metrics_rollup",
    "dedup_exact",
    "minhash_signatures",
    "lsh_dup_pairs",
    "simhash",
    "embedding_topk",
    "ann_topk_bucketed",
    "lang_id",
    "token_counts",
    "quality_score",
    "fingerprint",
    "events_rollup",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_crawl(spark, sf_dir: str) -> dict:
    """Flagship: full frontier BFS; throughput = (scheduled + fetched) / wall."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.plans.frontier import (
        CrawlConfig,
        crawl,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import (
        pages as pagesrc,
    )

    pages = pagesrc.synth_clean_pages(spark, sf_dir)
    seeds = spark.sql(pagesrc.seeds_sql())
    t0 = time.time()
    res = crawl(spark, pages, seeds, CrawlConfig())
    n_seen = res.seen.count()
    wall = time.time() - t0
    sched = sum(m["scheduled"] for m in res.metrics)
    fetched = sum(m["fetched"] for m in res.metrics)
    return {
        "wall_s": round(wall, 3),
        "iterations": res.iterations,
        "urls_scheduled": sched,
        "urls_fetched": fetched,
        "urls_seen": n_seen,
        "urls_per_sec": round((sched + fetched) / wall, 1),
        "iter_wall_s": [m["wall_s"] for m in res.metrics],
    }


def run_bench(sf_dir: str) -> dict:
    import __spark_entry__ as entrymod
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark import get_spark

    spark = get_spark(app_name="bench")
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    t_total0 = time.time()

    crawl_stats = run_crawl(spark, sf_dir)
    timings["crawl_frontier_bfs"] = crawl_stats["wall_s"]

    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_total0, 3)
    return {
        "metric": "frontier_bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "crawl": crawl_stats,
    }


def run_scaling(sf_dir: str) -> dict:
    """Same crawl at local[8] vs local[32]; efficiency per north_rule."""
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--crawl-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
    tp8, tp32 = out[8]["urls_per_sec"], out[32]["urls_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "throughput_local8": tp8,
        "throughput_local32": tp32,
        "crawl_8": out[8],
        "crawl_32": out[32],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    elif "--crawl-only" in sys.argv:
        from go_crawler_20251102_011312_url_crawlerv10_twotier_spark import get_spark

        spark = get_spark(app_name="bench-crawl")
        print(json.dumps(run_crawl(spark, sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir)))


if __name__ == "__main__":
    main()
