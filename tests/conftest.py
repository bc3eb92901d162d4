import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL
