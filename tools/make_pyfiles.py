"""Build the spark-submit --py-files artifact (north_rule packaging).

    python tools/make_pyfiles.py [out.zip]

Zips the engine package (source only, no caches) so that

    spark-submit --py-files engine.zip \
        go_crawler_20251102_011312_url_crawlerv10_twotier_spark/job.py ...

resolves every ``go_crawler_..._spark.*`` import on the driver and on
every executor. Verified end-to-end by tests/test_submit.py.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "go_crawler_20251102_011312_url_crawlerv10_twotier_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(build(out))
