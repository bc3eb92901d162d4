"""Cuckoo-filter seen set (operators/cuckoo.py).

The load-bearing property is NO FALSE NEGATIVES — a false negative
would let a seen URL skip the exact anti-join and re-enter the
frontier, breaking J1 exactness (crawler_twotier.go:224-245's map
never forgets an insert). Every test here asserts it somewhere; the
deletion tests additionally pin the one capability the Bloom shards
lack (forgetting without a rebuild).
"""

import numpy as np
import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import (
    cuckoo,
    dedup,
)


def _keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 2**64, size=n, dtype=np.uint64))


# ---------------------------------------------------------------- numpy core


def test_insert_all_no_false_negatives_and_slot_accounting():
    u = _keys(20000)
    table, st_i, st_fp = cuckoo._insert_all(u)
    nb = len(table) // cuckoo.SLOTS
    # every inserted key occupies exactly one slot or one stash entry
    assert int(np.count_nonzero(table)) + len(st_i) == len(u)
    assert cuckoo._probe_arrays(u, table, st_i, st_fp, nb).all()
    # load factor honored by sizing
    assert len(u) <= nb * cuckoo.SLOTS * cuckoo.LOAD_TARGET + 1


def test_false_positive_rate_small():
    u = _keys(20000, seed=1)
    table, st_i, st_fp = cuckoo._insert_all(u)
    nb = len(table) // cuckoo.SLOTS
    others = np.setdiff1d(_keys(20000, seed=2), u)
    fp = cuckoo._probe_arrays(others, table, st_i, st_fp, nb).mean()
    # 16-bit fingerprints, 8 slots examined => ~2^-13 per slot; give slack
    assert fp < 0.01


def test_overfull_table_degrades_to_stash_not_false_negatives():
    """Force a 16-bucket table (capacity 64) with 200 keys: the stash
    absorbs the overflow and membership still holds for every key."""
    u = _keys(220, seed=3)[:200]
    table, st_i, st_fp = cuckoo._insert_all(u, nbuckets=16)
    assert len(st_i) > 0  # the pathological path actually ran
    assert cuckoo._probe_arrays(u, table, st_i, st_fp, 16).all()


def test_build_deterministic():
    u = _keys(5000, seed=4)
    a = cuckoo._insert_all(u)
    b = cuckoo._insert_all(np.flip(u).copy())  # input order must not matter
    assert a[0].tobytes() == b[0].tobytes()
    assert a[1].tobytes() == b[1].tobytes() and a[2].tobytes() == b[2].tobytes()


def test_delete_all_empties_the_filter():
    u = _keys(5000, seed=5)
    table, st_i, st_fp = cuckoo._insert_all(u)
    nb = len(table) // cuckoo.SLOTS
    for uv in u:
        st_i, st_fp, found = cuckoo._delete_one(int(uv), table, st_i, st_fp, nb)
        assert found
    assert not table.any() and len(st_i) == 0
    assert not cuckoo._probe_arrays(u, table, st_i, st_fp, nb).any()


def test_delete_half_keeps_membership_for_the_rest():
    u = _keys(4000, seed=6)
    gone, kept = u[::2], u[1::2]
    table, st_i, st_fp = cuckoo._insert_all(u)
    nb = len(table) // cuckoo.SLOTS
    for uv in gone:
        st_i, st_fp, _ = cuckoo._delete_one(int(uv), table, st_i, st_fp, nb)
    # the Bloom-impossible half: deletions actually forget
    assert cuckoo._probe_arrays(gone, table, st_i, st_fp, nb).mean() < 0.01
    # and NEVER at the cost of false negatives on survivors
    assert cuckoo._probe_arrays(kept, table, st_i, st_fp, nb).all()


def test_incremental_insert_matches_membership():
    u = _keys(3000, seed=8)
    base, delta = u[: len(u) // 2], u[len(u) // 2 :]
    table, st_i, st_fp = cuckoo._insert_all(base)
    nb = len(table) // cuckoo.SLOTS
    for uv in delta:
        st_i, st_fp = cuckoo._insert_one(int(uv), table, st_i, st_fp, nb)
    assert cuckoo._probe_arrays(u, table, st_i, st_fp, nb).all()


def test_delete_missing_key_is_counted_noop():
    u = _keys(100, seed=9)
    table, st_i, st_fp = cuckoo._insert_all(u)
    nb = len(table) // cuckoo.SLOTS
    # a key far outside the set whose fingerprint collides with nothing
    missing = _keys(3000, seed=10)
    missing = np.setdiff1d(missing, u)
    before = table.copy()
    _, _, found = cuckoo._delete_one(int(missing[0]), table, st_i, st_fp, nb)
    # either a counted no-op, or (fp-collision) one slot cleared — but
    # on this sparse fixture the first candidates don't collide
    assert not found
    assert table.tobytes() == before.tobytes()


# ---------------------------------------------------------------- spark API


def test_cuckoo_prefilter_exactness(spark):
    cand = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url_norm string")
    seen = spark.createDataFrame([(f"u{i}",) for i in range(0, 100, 2)], "url_norm string")
    new = cuckoo.dedup_new_candidates_cuckoo(cand, seen)
    got = {r.url_norm for r in new.collect()}
    assert got == {f"u{i}" for i in range(1, 100, 2)}


def test_cuckoo_no_false_negatives_spark(spark):
    seen = spark.createDataFrame([(f"k{i}",) for i in range(500)], "url_norm string")
    cand = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "url_norm string")
    new, maybe = cuckoo.cuckoo_prefilter(cand, seen, n_shards=8)
    maybe_set = {r.url_norm for r in maybe.collect()}
    assert {f"k{i}" for i in range(500)} <= maybe_set
    new_set = {r.url_norm for r in new.collect()}
    assert new_set.isdisjoint({f"k{i}" for i in range(500)})
    # cuckoo FPP (16-bit fp) is far below Bloom's at this sizing: the
    # prefilter should skim nearly every unseen key past the shuffle
    assert len(new_set) > 480


def test_cuckoo_empty_seen(spark):
    seen = spark.createDataFrame([], "url_norm string")
    cand = spark.createDataFrame([("a",), ("b",)], "url_norm string")
    new, maybe = cuckoo.cuckoo_prefilter(cand, seen)
    assert {r.url_norm for r in new.collect()} == {"a", "b"}
    assert maybe.count() == 0


def test_update_shards_deletes_in_place(spark):
    """The headline: invalidate 1/3 of the seen set WITHOUT a rebuild
    and J1 stays exact against the shrunken set."""
    seen = spark.createDataFrame([(f"u{i}",) for i in range(300)], "url_norm string")
    removed = spark.createDataFrame([(f"u{i}",) for i in range(0, 300, 3)], "url_norm string")
    live = seen.join(removed, "url_norm", "left_anti")
    cand = spark.createDataFrame([(f"u{i}",) for i in range(400)], "url_norm string")

    shards = cuckoo.build_cuckoo_shards(seen, n_shards=8)
    updated = cuckoo.update_cuckoo_shards(shards, removals=removed, n_shards=8)
    new, maybe = cuckoo.cuckoo_probe_shards(cand, updated, n_shards=8)
    result = {r.url_norm for r in new.collect()} | {
        r.url_norm for r in dedup.seen_anti_join(maybe, live).collect()
    }
    expect = {r.url_norm for r in cand.join(live, "url_norm", "left_anti").collect()}
    assert result == expect
    # live keys all still answer (no false negatives survive deletion)
    maybe_set = {r.url_norm for r in maybe.collect()}
    assert {r.url_norm for r in live.collect()} <= maybe_set
    # n_keys audit tracks the deletions
    n_live = sum(r.n_keys for r in updated.collect())
    assert n_live == live.count()


def test_update_shards_additions_and_fresh_shards(spark):
    """Additions insert incrementally; shards that never existed
    (empty standing state) build fresh inside the same cogroup."""
    base = spark.createDataFrame([(f"a{i}",) for i in range(100)], "url_norm string")
    delta = spark.createDataFrame([(f"b{i}",) for i in range(100)], "url_norm string")
    shards = cuckoo.build_cuckoo_shards(base, n_shards=4)
    updated = cuckoo.update_cuckoo_shards(shards, additions=delta, n_shards=4)
    allk = base.unionByName(delta)
    new, maybe = cuckoo.cuckoo_probe_shards(allk, updated, n_shards=4)
    assert new.count() == 0  # every inserted key probes maybe
    assert maybe.count() == 200

    # fresh-shard path: start from NO state at all
    none = spark.createDataFrame([], cuckoo._SHARD_SCHEMA)
    built = cuckoo.update_cuckoo_shards(none, additions=delta, n_shards=4)
    new2, maybe2 = cuckoo.cuckoo_probe_shards(delta, built, n_shards=4)
    assert new2.count() == 0 and maybe2.count() == 100


def test_resolve_cuckoo_shards_bounds():
    assert cuckoo.resolve_cuckoo_shards(1000) == 16
    ns = cuckoo.resolve_cuckoo_shards(10**10)
    assert ns * cuckoo.MAX_KEYS_PER_SHARD >= 10**10  # per-task work bounded
    assert ns <= 1 << 14
