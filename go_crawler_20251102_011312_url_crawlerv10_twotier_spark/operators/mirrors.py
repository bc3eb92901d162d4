"""Mirror-host detection over content fingerprints.

Mirrors are a crawl-budget problem the reference cannot see: its
seen set (``crawler/crawler_twotier.go:23-24``) is keyed by URL, so
two hosts serving identical content get fetched twice in full. At
10^10-URL scale, mirror families (regional CDN vanity hosts, http/
https+www splits that survive normalization, wholesale site clones)
are a double-digit percentage of fetch spend. This operator finds
them from data the crawl already has — a content fingerprint per
page — so the scheduler can collapse a family to one representative
host (compose with ``politeness.schedule``: route the family's budget
to the representative).

Scale shape — the classic trap here is the fingerprint self-join: a
boilerplate fingerprint shared by 10^5 hosts (an empty page, a parked-
domain template) contributes C(10^5, 2) pairs. So fingerprints are
capped at ``max_hosts_per_fp`` distinct hosts BEFORE pairing (pair
count is then <= n_fps * C(cap, 2), linear in the corpus), and the cap
is audited, not silent: ``mirror_cap_audit`` reports how many
fingerprints the cap dropped and the hottest fingerprint's host
count. A capped fingerprint is template noise by construction — it
cannot be mirror evidence, because it fails to discriminate hosts.

Everything is built-in Catalyst (md5 fingerprints so the DuckDB
oracle recomputes them bit-for-bit); the mirror flag is an integer
cross-multiply, never a float compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_fingerprints(
    docs: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """Distinct (host, fp) pairs — the per-host content set. One
    shuffle; within-host duplicate pages collapse map-side."""
    return docs.select(
        F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("fp")
    ).distinct()


def host_mirror_pairs(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    max_hosts_per_fp: int = 8,
    min_shared: int = 2,
    threshold_pct: int = 50,
) -> DataFrame:
    """Host pairs ranked by content overlap. For each pair of hosts
    sharing >= ``min_shared`` eligible fingerprints:

    ``(host_a, host_b, shared_fps, n_fps_a, n_fps_b, is_mirror)``

    where ``is_mirror`` is Jaccard(host content sets) >=
    ``threshold_pct``/100, evaluated as ``100*shared >=
    pct*(n_a + n_b - shared)`` — integer arithmetic, engine-exact.
    Set sizes count ALL the host's fingerprints (capped ones
    included — they are still content the host serves); the overlap
    counts only cap-eligible fingerprints, so template noise can
    never *create* a mirror pair, only dilute one (conservative by
    construction).

    Plan: fps distinct (shuffle 1) → per-fp host count (shuffle 2) →
    eligible self-join on fp with host_a < host_b (shuffle 3, pair
    fan-out bounded by the cap) → pair count (shuffle 4) + two
    size attach joins. No step is ever corpus-quadratic.
    """
    fps = host_fingerprints(docs, host_col, text_col)
    fp_hosts = fps.groupBy("fp").agg(F.count("*").alias("nh"))
    eligible = (
        fps.join(fp_hosts, "fp")
        .filter(F.col("nh") <= F.lit(max_hosts_per_fp))
        .select("fp", "host")
    )
    sizes = fps.groupBy("host").agg(F.count("*").cast("bigint").alias("n_fps"))

    a = eligible.select(F.col("fp"), F.col("host").alias("host_a"))
    b = eligible.select(F.col("fp"), F.col("host").alias("host_b"))
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= F.lit(min_shared))
    )
    out = (
        shared.join(sizes.withColumnRenamed("host", "host_a").withColumnRenamed("n_fps", "n_fps_a"), "host_a")
        .join(sizes.withColumnRenamed("host", "host_b").withColumnRenamed("n_fps", "n_fps_b"), "host_b")
    )
    union_sz = F.col("n_fps_a") + F.col("n_fps_b") - F.col("shared_fps")
    return out.select(
        "host_a",
        "host_b",
        "shared_fps",
        "n_fps_a",
        "n_fps_b",
        (F.col("shared_fps") * 100 >= F.lit(threshold_pct) * union_sz).alias("is_mirror"),
    )


def mirror_cap_audit(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    max_hosts_per_fp: int = 8,
) -> DataFrame:
    """The no-silent-caps companion: ONE row —
    ``(n_fps, n_capped, max_fp_hosts)`` = distinct fingerprints in the
    corpus, how many the pairing cap excluded, and the hottest
    fingerprint's host count. A rising n_capped means template noise
    (or a cap set below real mirror-family sizes — raise it)."""
    fp_hosts = host_fingerprints(docs, host_col, text_col).groupBy("fp").agg(
        F.count("*").alias("nh")
    )
    return fp_hosts.agg(
        F.count("*").cast("bigint").alias("n_fps"),
        F.sum((F.col("nh") > F.lit(max_hosts_per_fp)).cast("long"))
        .cast("bigint")
        .alias("n_capped"),
        F.max("nh").cast("bigint").alias("max_fp_hosts"),
    )


def mirror_representatives(pairs: DataFrame) -> DataFrame:
    """Collapse mirror pairs to (host -> representative) using the
    min-host rule over the pair graph's edges — one pass, no iterative
    connected components: for crawl-budget purposes a host maps to the
    smallest host it mirrors (``is_mirror`` edges only). Chains deeper
    than one hop are rare in mirror families (they are near-cliques —
    every member pairs with every other, so every member sees the
    minimum directly); for full transitive closure feed the edges to
    dedup.connected_components instead."""
    e = pairs.filter(F.col("is_mirror"))
    both = e.select(F.col("host_a").alias("host"), F.col("host_b").alias("peer")).unionByName(
        e.select(F.col("host_b").alias("host"), F.col("host_a").alias("peer"))
    )
    return both.groupBy("host").agg(F.min("peer").alias("rep")).select(
        "host", F.least("host", "rep").alias("representative")
    )
