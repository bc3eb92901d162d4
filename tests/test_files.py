"""P8/P9/P11 filename + formatting functions (functions/files.py)."""

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.functions.files import (
    extract_filename,
    extract_filename_py,
    format_bytes_py,
    sanitize_filename_py,
)


def test_sanitize():
    assert sanitize_filename_py('a\\b/c:d*e?f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"
    assert sanitize_filename_py("x\x00y.pdf") == "x_y.pdf"
    long = "a" * 300 + ".pdf"
    out = sanitize_filename_py(long)
    assert len(out) == 200 and out.endswith(".pdf")
    assert out == "a" * 196 + ".pdf"


def test_extract_filename_content_disposition_wins():
    assert (
        extract_filename_py("https://x/u.bin", 'attachment; filename="r pt:1.pdf"')
        == "r pt_1.pdf"
    )
    # empty filename in CD falls through to the URL
    assert extract_filename_py("https://x/a.pdf", 'attachment; filename=""') == "a.pdf"
    # non-attachment CD ignored
    assert extract_filename_py("https://x/a.pdf", "inline; filename=z.pdf") == "a.pdf"


def test_extract_filename_url_paths():
    assert extract_filename_py("https://h/docs/r.pdf?x=1") == "r.pdf"
    assert extract_filename_py("https://h/docs/") == "download_0"
    assert extract_filename_py("https://h/docs/readme") == "download_0"
    assert extract_filename_py("https://h/d/x.tar.gz", None, 7) == "x.tar.gz"
    assert extract_filename_py("https://h/d/", None, 7) == "download_7"


def test_format_bytes():
    assert format_bytes_py(0) == "0 B"
    assert format_bytes_py(1023) == "1023 B"
    assert format_bytes_py(1024) == "1.0 KB"
    assert format_bytes_py(1536) == "1.5 KB"
    assert format_bytes_py(1024 * 1024) == "1.0 MB"
    assert format_bytes_py(5 * 1024**3) == "5.0 GB"
    assert format_bytes_py(1024**6) == "1.0 EB"


def test_extract_filename_udf(spark):
    df = spark.createDataFrame(
        [
            ("https://h/docs/r.pdf?x=1", None, "0"),
            ("https://h/docs/", 'attachment; filename="a:b.pdf"', "1"),
            ("https://h/plain", None, "2"),
        ],
        "url string, cd string, sfx string",
    )
    got = [
        r.fn
        for r in df.select(
            extract_filename(F.col("url"), F.col("cd"), F.col("sfx")).alias("fn")
        ).collect()
    ]
    assert got == ["r.pdf", "a_b.pdf", "download_2"]
