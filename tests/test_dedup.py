"""Dedup operators: exact, minhash+LSH, simhash, jaccard, seen-set."""

from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import dedup


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown fox jumps"),  # exact dup of 0
        (2, "the quick brown fox leaps"),  # near dup
        (3, "completely different words here entirely"),
        (4, "the quick brown fox jumps"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = {r.keep_id: r.dup_count for r in dedup.exact_dedup(_docs(spark), "doc_id", "text").collect()}
    assert out[0] == 3  # 0,1,4 collapse, min id kept
    assert out[2] == 1 and out[3] == 1


def test_minhash_identical_sigs_for_dups(spark):
    sig = dedup.minhash_signatures(_docs(spark), "doc_id", "text", k=4)
    rows = {r.id: tuple(r[f"h{i}"] for i in range(4)) for r in sig.collect()}
    assert rows[0] == rows[1] == rows[4]
    assert rows[0] != rows[3]
    # near-dup shares most hash mins (4/5 token overlap)
    shared = sum(a == b for a, b in zip(rows[0], rows[2]))
    assert shared >= 1


def test_lsh_pairs_catch_dups(spark):
    sig = dedup.minhash_signatures(_docs(spark), "doc_id", "text", k=4)
    pairs = {(r.id_a, r.id_b) for r in dedup.lsh_dup_pairs(sig, k=4, rows_per_band=2).collect()}
    assert {(0, 1), (0, 4), (1, 4)} <= pairs
    assert not any(3 in p for p in pairs)


def test_lsh_auto_cap_rule(spark):
    """The auto cap is the p99 bucket size floored at `floor`: on a
    corpus of many small buckets plus ONE monster, the p99 stays
    small so the cap binds only on the monster; on a dense corpus
    where the big bucket IS the p99, nothing real is dropped."""
    from pyspark.sql import functions as F

    # 200 singleton docs (each its own vocabulary -> its own buckets)
    # + 30 identical docs (one monster bucket per band)
    singles = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(200)]
    monster = [(1000 + i, "same same2 same3 same4") for i in range(30)]
    docs = spark.createDataFrame(singles + monster, "doc_id long, text string")
    sig = dedup.minhash_signatures(docs, "doc_id", "text", k=4)
    # buckets: ~400 of size 1-ish and 2 of size 30 -> p99 is small,
    # floor dominates
    cap = dedup.lsh_auto_cap(sig, k=4, rows_per_band=2, floor=8)
    assert cap == 8
    pairs = dedup.lsh_dup_pairs(
        sig, k=4, rows_per_band=2, max_bucket_size="auto", auto_floor=8
    )
    # monster capped at 8 smallest ids => exactly C(8,2) monster pairs
    mon = pairs.filter(F.col("id_a") >= 1000)
    assert mon.count() == 28
    assert mon.agg(F.max("id_b")).collect()[0][0] == 1007

    # dense corpus: EVERY bucket is the monster -> p99 = bucket size,
    # auto cap rises to it and nothing is dropped
    dense = spark.createDataFrame(monster, "doc_id long, text string")
    sigd = dedup.minhash_signatures(dense, "doc_id", "text", k=4)
    assert dedup.lsh_auto_cap(sigd, k=4, rows_per_band=2, floor=8) == 30
    full = dedup.lsh_dup_pairs(
        sigd, k=4, rows_per_band=2, max_bucket_size="auto", auto_floor=8
    )
    assert full.count() == 30 * 29 // 2


def test_simhash_properties(spark):
    fp = {r.id: r.simhash for r in dedup.simhash(_docs(spark), "doc_id", "text").collect()}
    assert fp[0] == fp[1] == fp[4]
    assert all(v >= 0 for v in fp.values())  # 60-bit, fits signed long

    # hamming distance: near-dup closer than unrelated
    import pandas as pd

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])


def test_hamming_neardup_bucket_cap_deterministic(spark):
    """A degenerate cluster (identical fingerprints => one bucket in
    EVERY band) is bounded by max_bucket_size: the cap keeps the
    smallest ids, so exactly C(cap, 2) pairs survive — and the audit
    query shows what the cap cut."""
    rows = [(i, 12345, "s", 0) for i in range(6)] + [(99, 999999, "s", 0)]
    sig = spark.createDataFrame(rows, "id long, simhash long, source string, lbucket int")
    out = dedup.hamming_neardup_pairs(
        sig, ["source", "lbucket"], max_hamming=6, max_bucket_size=3
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}  # ids 3..5 capped away
    # uncapped: the full C(6,2) cluster
    full = dedup.hamming_neardup_pairs(sig, ["source", "lbucket"], max_hamming=6)
    assert len(full.collect()) == 15
    # audit shows 7 bands x one 6-doc bucket (id 99 differs in >6 bits
    # of every band here, so it never pairs; its own buckets hold 1-6)
    stats = dedup.hamming_bucket_stats(sig, ["source", "lbucket"], max_hamming=6)
    top = stats.head()
    assert top["n_docs"] in (6, 7)  # cluster bucket (7 if 99 collides in a band)


def test_jaccard_pairs(spark):
    docs = _docs(spark).withColumn("blk", F.lit(1))
    out = {(r.id_a, r.id_b): r.jaccard for r in
           dedup.jaccard_pairs(docs, "doc_id", "text", ["blk"], 0.5).collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 2)] == round(4 / 6, 6)  # 4 shared of 6 distinct tokens
    assert (0, 3) not in out


def test_seen_anti_join(spark):
    cand = spark.createDataFrame([("a",), ("b",), ("c",)], "url_norm string")
    seen = spark.createDataFrame([("b",)], "url_norm string")
    got = {r.url_norm for r in dedup.seen_anti_join(cand, seen).collect()}
    assert got == {"a", "c"}


def test_bloom_prefilter_exactness(spark):
    cand = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url_norm string")
    seen = spark.createDataFrame([(f"u{i}",) for i in range(0, 100, 2)], "url_norm string")
    new = dedup.dedup_new_candidates(cand, seen, use_bloom=True)
    got = {r.url_norm for r in new.collect()}
    assert got == {f"u{i}" for i in range(1, 100, 2)}


def test_bloom_no_false_negatives(spark):
    """Every seen key must probe True (the Bloom guarantee); unseen
    keys mostly probe False at this sizing (fp rate << 1)."""
    seen = spark.createDataFrame([(f"k{i}",) for i in range(500)], "url_norm string")
    cand = spark.createDataFrame(
        [(f"k{i}",) for i in range(1000)], "url_norm string"
    )
    new, maybe = dedup.bloom_prefilter(cand, seen, n_shards=8, bits_per_shard=1 << 16)
    maybe_set = {r.url_norm for r in maybe.collect()}
    assert {f"k{i}" for i in range(500)} <= maybe_set  # no false negatives
    new_set = {r.url_norm for r in new.collect()}
    assert new_set.isdisjoint({f"k{i}" for i in range(500)})
    # definitely-new must skip most unseen keys past the exact join
    assert len(new_set) > 400


def test_resolve_bloom_sizing_bounds():
    """Auto sizing: bounded pack work at any key count, floors at the
    small end, and build/probe get one coordinated pair."""
    ns, bits = dedup.resolve_bloom_sizing(1000)
    assert ns == 16 and bits == dedup.MIN_SHARD_BITS  # floors
    ns, bits = dedup.resolve_bloom_sizing(10**10)
    assert bits <= dedup.MAX_SHARD_BITS  # pack task bounded
    assert ns * bits >= 10**10 * 10 * 0.99  # ~10 bits/key total state
    # shard count grows with keys, never the per-shard pack size
    ns_small, _ = dedup.resolve_bloom_sizing(10**8)
    assert ns > ns_small
    assert bits % 8 == 0


def test_bloom_prefilter_auto_sizing_exact(spark):
    """The None-means-auto path stays exact (the guarantee sizing must
    never break: build and probe share the resolved pair)."""
    cand = spark.createDataFrame([(f"u{i}",) for i in range(200)], "url_norm string")
    seen = spark.createDataFrame([(f"u{i}",) for i in range(0, 200, 2)], "url_norm string")
    new, maybe = dedup.bloom_prefilter(cand, seen)  # auto
    got = {r.url_norm for r in new.collect()} | {
        r.url_norm
        for r in dedup.seen_anti_join(maybe, seen).collect()
    }
    assert got == {f"u{i}" for i in range(1, 200, 2)}


def test_bloom_empty_seen(spark):
    seen = spark.createDataFrame([], "url_norm string")
    cand = spark.createDataFrame([("a",), ("b",)], "url_norm string")
    new, maybe = dedup.bloom_prefilter(cand, seen)
    assert {r.url_norm for r in new.collect()} == {"a", "b"}
    assert maybe.count() == 0


def test_latest_snapshot_keeps_newest_version(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.dedup import (
        latest_snapshot,
    )

    rows = [
        ("u1", "2025-01-01 00:00:01", "a1", 1),
        ("u1", "2025-01-03 00:00:00", "a3", 3),
        ("u1", "2025-01-02 00:00:00", "a2", 2),
        ("u2", "2025-01-01 00:00:00", "b1", 9),
    ]
    df = (
        spark.createDataFrame(rows, "url_norm string, ts string, body string, n int")
        .selectExpr("url_norm", "to_timestamp(ts) AS warc_ts", "body", "n")
    )
    got = {r.url_norm: (r.body, r.n) for r in latest_snapshot(df).collect()}
    assert got == {"u1": ("a3", 3), "u2": ("b1", 9)}
    assert set(latest_snapshot(df).columns) == {"url_norm", "warc_ts", "body", "n"}


def test_ngram_span_stats(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.dedup import (
        ngram_span_stats,
    )

    rows = [
        # d0 and d1 share the exact span "a b c" (and only that one)
        (0, "a b c x y"),       # grams: "a b c","b c x","c x y"
        (1, "q a b c z"),       # grams: "q a b","a b c","b c z"
        (2, "p q"),             # shorter than n -> zero grams
        (3, "a b c a b c"),     # repeated span inside ONE doc only:
                                # distinct grams unique corpus-wide
                                # except "a b c" (shared with d0/d1)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.id: (r.n_grams, r.dup_grams, r.dup_frac)
        for r in ngram_span_stats(df, "doc_id", "text", n=3).collect()
    }
    assert got[0] == (3, 1, 1 / 3)
    assert got[1] == (3, 1, 1 / 3)
    assert got[2] == (0, 0, 0.0)
    # d3 grams: "a b c","b c a","c a b" (x2 dedup) -> only "a b c" shared
    assert got[3] == (3, 1, 1 / 3)


def test_ngram_span_stats_whitespace_and_self_dup(spark):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.dedup import (
        ngram_span_stats,
    )

    rows = [
        (0, "  w1   w2 w1 w2  "),  # leading/trailing + runs collapse
        (1, "w1 w2 w1"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.id: (r.n_grams, r.dup_grams)
        for r in ngram_span_stats(df, "doc_id", "text", n=2).collect()
    }
    # d0 distinct 2-grams: "w1 w2","w2 w1"; d1: "w1 w2","w2 w1" -> all shared
    assert got[0] == (2, 2)
    assert got[1] == (2, 2)


# ---------------------------------------------------------------------------
# connected components / dup_clusters
# ---------------------------------------------------------------------------


def test_connected_components_basic(spark):
    # two components: {1,2,3,7} via a path + {10,11}; 5 isolated (absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    cc = {r.id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_path_chain(spark):
    # worst case for naive propagation: a long path — star ops still
    # converge (O(log^2 n) rounds), and every node labels to the min
    n = 33
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    cc = {r.id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert len(cc) == n + 1 and set(cc.values()) == {0}


def test_connected_components_reversed_and_dup_edges(spark):
    # symmetrization: edge direction and duplicates must not matter
    pairs = spark.createDataFrame(
        [(5, 2), (2, 5), (9, 5), (9, 5)], "id_a long, id_b long"
    )
    cc = {r.id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert cc == {2: 2, 5: 2, 9: 2}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(pairs).count() == 0


def test_dup_clusters_keeplist(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 4), (2, 3)], "id_a long, id_b long")
    rows = {r.doc_id: (r.cluster_id, r.is_canonical)
            for r in dedup.dup_clusters(docs, pairs).collect()}
    # transitive: 4 joins 0's cluster through 1 even with no (0,4) pair
    assert rows == {
        0: (0, True), 1: (0, False), 4: (0, False),
        2: (2, True), 3: (2, False),
        5: (5, True),  # isolated doc is its own canonical
    }


def test_cluster_representatives_best_quality_wins(spark):
    # same components as the keeplist test, but the survivor is the
    # highest-score member, not the min id; ties break to LOWEST id
    docs = spark.createDataFrame(
        [(0, 10), (1, 99), (4, 99), (2, 7), (3, 7), (5, 1)],
        "doc_id long, q long",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 4), (2, 3)], "id_a long, id_b long"
    )
    from pyspark.sql import functions as F

    rows = {
        r.doc_id: (r.cluster_id, r.rep_id, r.is_kept)
        for r in dedup.cluster_representatives(
            docs, pairs, score=F.col("q")
        ).collect()
    }
    assert rows == {
        # {0,1,4}: 1 and 4 tie at 99 > 0's 10 -> lowest id of the tie (1)
        0: (0, 1, False), 1: (0, 1, True), 4: (0, 1, False),
        # {2,3}: tie at 7 -> lowest id (2)
        2: (2, 2, True), 3: (2, 2, False),
        # singleton always kept
        5: (5, 5, True),
    }


def test_cluster_representatives_vs_dup_clusters_same_partition(spark):
    # identical component structure as dup_clusters; only the survivor
    # choice differs — and with score constant, the tie rule (lowest
    # id) reproduces dup_clusters' canonical exactly
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(6, 7), (1, 3), (3, 5)], "id_a long, id_b long"
    )
    reps = dedup.cluster_representatives(docs, pairs, score=F.lit(0))
    canon = dedup.dup_clusters(docs, pairs)
    got = {(r.doc_id, r.cluster_id, r.is_kept) for r in reps.collect()}
    want = {
        (r.doc_id, r.cluster_id, r.is_canonical) for r in canon.collect()
    }
    assert got == want


def test_ngram_span_scrub_removes_shared_spans(spark):
    # docs 0 and 1 share an 8-token span; doc 2 is clean
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, f"{shared} unique tail zero"),
            (1, f"one lead {shared} unique tail"),
            (2, "totally different words that never repeat anywhere else"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.ngram_span_scrub(docs, n=8).collect()}
    # the shared region is alpha..theta PLUS the common continuation
    # "unique tail" (overlapping grams like "beta..theta unique" are
    # also cross-doc dups) -> 10 covered tokens per doc
    assert rows[0].n_tokens == 11 and rows[0].n_removed == 10
    assert rows[0].clean_text == "zero"
    assert rows[1].n_tokens == 12 and rows[1].n_removed == 10
    assert rows[1].clean_text == "one lead"
    assert rows[2].n_removed == 0
    assert rows[2].clean_text == "totally different words that never repeat anywhere else"


def test_ngram_span_scrub_overlapping_spans(spark):
    # two docs identical for 9 tokens -> two overlapping dup grams,
    # coverage union = 9 tokens, not 16
    nine = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    docs = spark.createDataFrame(
        [(0, f"{nine} x0"), (1, f"{nine} y1")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in dedup.ngram_span_scrub(docs, n=8).collect()}
    assert rows[0].n_removed == 9 and rows[0].clean_text == "x0"
    assert rows[1].n_removed == 9 and rows[1].clean_text == "y1"


def test_ngram_span_scrub_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, "short doc"), (1, ""), (2, "  spaced   out  ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.ngram_span_scrub(docs, n=8).collect()}
    assert rows[0].n_removed == 0 and rows[0].clean_text == "short doc"
    assert rows[1].n_tokens == 0 and rows[1].clean_text == ""
    assert rows[2].clean_text == "spaced out"  # whitespace normalizes


def test_connected_components_vs_union_find_random_graphs(spark):
    """Randomized cross-check: star-op CC == sequential union-find on
    seeded random graphs (mixed density, self-loops, dup edges)."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(8):
        n_nodes = rng.randint(5, 80)
        n_edges = rng.randint(0, 120)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        # union-find reference
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for a, b in edges:
            if a != b:
                for v in (a, b):
                    r = find(v)
                    while parent[r] != r:
                        r = parent[r]
                    expected[v] = r
        # min-root canonicalization: map each root to min member
        comp_members = {}
        for v, r in expected.items():
            comp_members.setdefault(r, set()).add(v)
        expected = {
            v: min(members)
            for r, members in comp_members.items()
            for v in members
        }

        pairs = spark.createDataFrame(
            edges or [(0, 0)], "id_a long, id_b long"
        )
        got = {
            r.id: r.cluster_id
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == expected, f"trial {trial}: {sorted(got.items())[:10]}"


def test_benchmark_contamination_flags_leaked_docs(spark):
    """A doc verbatim-contained in the bench set scores 1.0; disjoint
    docs score 0.0; partial overlap counts exactly the shared grams."""
    mk = lambda i: " ".join(f"w{i}t{j}" for j in range(12))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (0, mk(0)),                       # leaked verbatim
            (1, mk(1)),                       # clean
            (2, mk(0) + " " + mk(1)),         # half leaked
            (3, "too short"),                 # no grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, mk(0))], "doc_id long, text string")
    out = {
        r.id: r
        for r in dedup.benchmark_contamination(
            docs, bench, n=8, threshold=0.3
        ).collect()
    }
    # 12 tokens -> 5 distinct 8-grams per mk() block
    assert (out[0].n_grams, out[0].bench_grams) == (5, 5)
    assert out[0].contamination == 1.0 and out[0].contaminated
    assert out[1].bench_grams == 0 and not out[1].contaminated
    # doc 2 has 24 tokens -> 17 grams; the 5 grams inside the mk(0)
    # prefix match, the boundary-crossing ones don't
    assert (out[2].n_grams, out[2].bench_grams) == (17, 5)
    assert not out[2].contaminated  # 5/17 = 0.294 < 0.3
    assert (out[3].n_grams, out[3].contamination) == (0, 0.0)
