"""Training-shard sink: layout, shard bounds, manifest certification."""

import glob
import shutil
import tempfile

import pyarrow.parquet as pq

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources import shards


def _refined(spark):
    rows = [
        (i, "en" if i % 3 else "de", 10 + i, 2.0 if i % 3 else 1.25)
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, stratum string, n_tokens long, weight double"
    )


def test_write_training_shards_roundtrip_and_bounds(spark):
    out = tempfile.mkdtemp(prefix="shards_")
    try:
        df = _refined(spark)
        manifest = shards.write_training_shards(
            df, out, max_records_per_file=4
        )
        # hive layout, one dir per stratum
        dirs = sorted(
            p.split("stratum=")[1]
            for p in glob.glob(f"{out}/stratum=*")
        )
        assert dirs == ["de", "en"]
        # every shard file respects the record bound
        for f in glob.glob(f"{out}/stratum=*/*.parquet"):
            assert pq.read_metadata(f).num_rows <= 4, f
        # re-read equals input (the _manifest dir is _-hidden)
        back = spark.read.parquet(out)
        assert sorted(
            (r.doc_id, r.stratum, r.n_tokens) for r in back.collect()
        ) == sorted((r.doc_id, r.stratum, r.n_tokens) for r in df.collect())
        # manifest certifies the written files
        m = {r.stratum: (r.n_docs, r.n_tokens) for r in manifest.collect()}
        assert m["en"] == (20, sum(10 + i for i in range(30) if i % 3))
        assert m["de"] == (10, sum(10 + i for i in range(30) if not i % 3))
    finally:
        shutil.rmtree(out, ignore_errors=True)
