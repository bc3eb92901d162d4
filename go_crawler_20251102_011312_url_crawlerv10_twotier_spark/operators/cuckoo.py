"""Sharded cuckoo-filter URL-seen set.

The north_rule asks for a "partitioned Bloom/cuckoo URL-seen set
keyed by xxhash64(url)" (reference seen set:
``crawler/crawler_twotier.go:23-24,224-245`` — an in-process
``map[string]bool``). ``operators/dedup.py`` ships the Bloom half;
this module is the cuckoo half (Fan et al. 2014, "Cuckoo Filter:
Practically Better Than Bloom"), and exists for the one thing a Bloom
filter cannot do at 10^10 keys: **forget**. When a recrawl invalidates
URLs (content changed, pages removed, snapshot expiry), the Bloom
shards must be rebuilt from the full seen table — a complete pass over
10^10 keys — while the cuckoo shards delete the invalidated
fingerprints in place, touching only the delta.

Shape mirrors the Bloom path deliberately (same shard key, same
broadcast-probe discipline, same exactness contract):

* state = one row per shard ``(shard, nbuckets, n_keys, table binary,
  stash_i binary, stash_fp binary)``; shard = ``pmod(xxhash64(key),
  n_shards)`` exactly like ``build_bloom_shards``, so the two filters
  are drop-in for each other;
* build is ONE shuffle: keys hash JVM-side, each shard's table packs
  in a grouped Arrow task — placement is vectorized numpy for the
  ~97 % of keys whose first or second bucket has room, a Python
  eviction loop only for the tail, and a stash (with the count
  audited on the shard row) for the pathological remainder, so a
  build can never fail;
* probe broadcasts the collected shard dict as a REAL broadcast
  variable read inside a pandas UDF — never broadcast-JOINED (the
  dedup.py lesson: a join materializes the blob per candidate row);
* **no false negatives, ever**: every inserted fingerprint lives in
  one of its two buckets or the stash, deletions remove one matching
  occurrence (a (bucket, fp)-colliding twin keeps answering for both
  keys — membership semantics are identical for the pair, Fan §4), so
  ``definitely_new`` rows may safely skip the exact anti-join and
  false positives fall through to it — results stay exact.

Filter geometry: 4 slots/bucket, 16-bit fingerprints, load factor
capped at 0.84 (under the 0.95 feasibility threshold for b=4), i.e.
~2.4 bytes/key — comparable to the Bloom shards' 10 bits/key at a
lower FP rate (~2^-13 per probe). Bucket index i1 takes hash bits
6..23 (bits 0..5 are the shard id, as in dedup._bloom_positions —
sharing them would confine each shard's keys to a fraction of its
buckets), the fingerprint takes bits 32..47, so index and fingerprint
are independent. i2 = i1 XOR H(fp) — the partial-key cuckoo trick
that lets eviction move a fingerprint without knowing its key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
FP_MASK = np.uint64(0xFFFF)
LOAD_TARGET = 0.84
MAX_KICKS = 500
#: keys per shard bound: table = n/LOAD_TARGET * 2 bytes ≈ 5 MB at
#: 2M keys — same per-task budget as dedup.MAX_SHARD_BITS
MAX_KEYS_PER_SHARD = 1 << 21

_SHARD_SCHEMA = (
    "shard int, nbuckets int, n_keys bigint, n_stash int, "
    "table binary, stash_i binary, stash_fp binary"
)


def resolve_cuckoo_shards(n_keys: int, max_shards: int = 1 << 14) -> int:
    """Shard count from the seen-set size: one grouped-Arrow task
    builds one shard, so keys/shard (not total keys) bounds task
    memory and the Python eviction tail. Floor 16 keeps small builds
    parallel; the cap keeps the broadcast dict enumerable."""
    return int(max(16, min(max_shards, -(-max(1, n_keys) // MAX_KEYS_PER_SHARD))))


def _as_u64(h: np.ndarray) -> np.ndarray:
    """Bit-exact reinterpret of Spark's signed xxhash64 values."""
    return np.ascontiguousarray(h, dtype=np.int64).view(np.uint64)


def _fields(u: np.ndarray, nbuckets: int):
    """(i1, fp) for unsigned 64-bit hashes. fp==0 is the empty-slot
    sentinel, so real zero fingerprints map to 1 (a 2^-16 sliver of
    keyspace doubles up on fp 1 — membership still holds)."""
    mask = np.uint64(nbuckets - 1)
    i1 = ((u >> np.uint64(6)) & mask).astype(np.int64)
    fp = ((u >> np.uint64(32)) & FP_MASK).astype(np.uint16)
    fp[fp == 0] = 1
    return i1, fp


def _alt(i: np.ndarray | int, fp: np.ndarray | int, nbuckets: int):
    """Partial-key alternate bucket: i XOR H(fp). H spreads the 16-bit
    fingerprint over the index range (multiply-shift; bits 8..26 of
    the 48-bit product, disjoint from the fp bits themselves)."""
    h = (np.asarray(fp, dtype=np.uint64) * np.uint64(0x5BD1E995)) >> np.uint64(8)
    return (np.asarray(i, dtype=np.int64) ^ (h & np.uint64(nbuckets - 1)).astype(np.int64))


def _nbuckets_for(n: int) -> int:
    nb = 16
    while nb * SLOTS * LOAD_TARGET < n:
        nb <<= 1
    return nb


def _rank_in_group(keys: np.ndarray) -> np.ndarray:
    """For a SORTED key vector, the 0-based rank of each element
    within its run of equals (vectorized)."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.r_[0, np.flatnonzero(np.diff(keys)) + 1]
    lengths = np.diff(np.r_[starts, n])
    return np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)


def _insert_all(u: np.ndarray, nbuckets: int | None = None):
    """Build one shard's table from unsigned hashes. Returns
    (table uint16[nb*SLOTS], stash_i int64[], stash_fp uint16[]).

    Three passes: vectorized first-bucket fill, vectorized
    second-bucket fill for the overflow, then the classic eviction
    loop for the residue (a few % at load 0.84) with a deterministic
    victim (kick % SLOTS) so two builds of the same keys are
    byte-identical. Keys are deduped+sorted first — same determinism
    guarantee, and duplicate hashes cost one slot, not two."""
    u = np.unique(u)
    n = len(u)
    nb = _nbuckets_for(n) if nbuckets is None else nbuckets
    i1, fp = _fields(u, nb)
    table = np.zeros(nb * SLOTS, dtype=np.uint16)

    # pass A: first bucket, first-SLOTS ranks per bucket win
    order = np.argsort(i1, kind="stable")
    si, sf = i1[order], fp[order]
    rk = _rank_in_group(si)
    pl = rk < SLOTS
    table[si[pl] * SLOTS + rk[pl]] = sf[pl]
    occ = np.minimum(np.bincount(si, minlength=nb), SLOTS)

    # pass B: overflow tries its alternate bucket's free slots
    li, lf = si[~pl], sf[~pl]
    i2 = _alt(li, lf, nb)
    order2 = np.argsort(i2, kind="stable")
    ti, tf, tsrc = i2[order2], lf[order2], li[order2]
    rk2 = _rank_in_group(ti)
    slot = occ[ti] + rk2
    pl2 = slot < SLOTS
    table[ti[pl2] * SLOTS + slot[pl2]] = tf[pl2]

    # pass C: eviction loop for the residue
    stash_i: list[int] = []
    stash_fp: list[int] = []
    for i0, f0 in zip(tsrc[~pl2], tf[~pl2]):
        i, f = int(i0), int(f0)
        # re-check both buckets (earlier kicks may have freed a slot)
        placed = False
        for cand in (i, int(_alt(i, f, nb))):
            b = table[cand * SLOTS : (cand + 1) * SLOTS]
            e = np.flatnonzero(b == 0)
            if len(e):
                b[e[0]] = f
                placed = True
                break
        if placed:
            continue
        i = int(_alt(i, f, nb))
        for kick in range(MAX_KICKS):
            j = i * SLOTS + (kick % SLOTS)
            f, table[j] = int(table[j]), f
            i = int(_alt(i, f, nb))
            b = table[i * SLOTS : (i + 1) * SLOTS]
            e = np.flatnonzero(b == 0)
            if len(e):
                b[e[0]] = f
                break
        else:
            stash_i.append(i)
            stash_fp.append(f)
    return table, np.asarray(stash_i, dtype=np.int64), np.asarray(stash_fp, dtype=np.uint16)


def _probe_arrays(u, table, stash_i, stash_fp, nbuckets) -> np.ndarray:
    """Vectorized membership over unsigned hashes: fp present in
    bucket i1 or i2, or a stash entry with the same fp anchored at
    either bucket (a stashed item's recorded index is one of its two
    home buckets, so candidate-pair ∩ {entry_i} ≠ ∅ ⇔ same pair)."""
    nb = nbuckets
    i1, fp = _fields(u, nb)
    i2 = _alt(i1, fp, nb)
    t = table.reshape(nb, SLOTS)
    out = (t[i1] == fp[:, None]).any(axis=1) | (t[i2] == fp[:, None]).any(axis=1)
    for ei, ef in zip(stash_i, stash_fp):
        out |= (fp == ef) & ((i1 == ei) | (i2 == ei))
    return out


def _delete_one(u_val: int, table, stash_i, stash_fp, nbuckets):
    """Remove ONE occurrence of u's fingerprint (first matching slot
    of bucket i1, then i2, then the stash). Returns the possibly
    shortened stash arrays and whether anything was removed. A key
    that was never inserted is a caller error (classic cuckoo
    contract); treated as a counted no-op, never an exception."""
    u = np.asarray([u_val], dtype=np.uint64)
    i1a, fpa = _fields(u, nbuckets)
    i1, fp = int(i1a[0]), int(fpa[0])
    for cand in (i1, int(_alt(i1, fp, nbuckets))):
        b = table[cand * SLOTS : (cand + 1) * SLOTS]
        hit = np.flatnonzero(b == fp)
        if len(hit):
            b[hit[0]] = 0
            return stash_i, stash_fp, True
    m = (stash_fp == fp) & ((stash_i == i1) | (stash_i == _alt(i1, fp, nbuckets)))
    hit = np.flatnonzero(m)
    if len(hit):
        keep = np.ones(len(stash_i), dtype=bool)
        keep[hit[0]] = False
        return stash_i[keep], stash_fp[keep], True
    return stash_i, stash_fp, False


def _insert_one(u_val: int, table, stash_i, stash_fp, nbuckets):
    """Incremental single-key insert (delta maintenance): empty slot
    in either bucket, else the eviction loop, else the stash."""
    u = np.asarray([u_val], dtype=np.uint64)
    i1a, fpa = _fields(u, nbuckets)
    i, f = int(i1a[0]), int(fpa[0])
    for cand in (i, int(_alt(i, f, nbuckets))):
        b = table[cand * SLOTS : (cand + 1) * SLOTS]
        e = np.flatnonzero(b == 0)
        if len(e):
            b[e[0]] = f
            return stash_i, stash_fp
    i = int(_alt(i, f, nbuckets))
    for kick in range(MAX_KICKS):
        j = i * SLOTS + (kick % SLOTS)
        f, table[j] = int(table[j]), f
        i = int(_alt(i, f, nbuckets))
        b = table[i * SLOTS : (i + 1) * SLOTS]
        e = np.flatnonzero(b == 0)
        if len(e):
            b[e[0]] = f
            return stash_i, stash_fp
    return np.r_[stash_i, np.int64(i)], np.r_[stash_fp, np.uint16(f)]


def _shard_row(shard, nb, n_keys, table, st_i, st_fp) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "shard": [int(shard)],
            "nbuckets": [int(nb)],
            "n_keys": [int(n_keys)],
            "n_stash": [int(len(st_i))],
            "table": [table.tobytes()],
            "stash_i": [st_i.astype(np.int64).tobytes()],
            "stash_fp": [st_fp.astype(np.uint16).tobytes()],
        }
    )


def _unpack_row(r):
    return (
        int(r["nbuckets"]),
        np.frombuffer(r["table"], dtype=np.uint16).copy(),
        np.frombuffer(r["stash_i"], dtype=np.int64).copy(),
        np.frombuffer(r["stash_fp"], dtype=np.uint16).copy(),
        int(r["n_keys"]),
    )


def _hashed(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    return df.select(F.xxhash64(key).alias("h")).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )


def build_cuckoo_shards(
    seen: DataFrame, key: str = "url_norm", n_shards: int = 64
) -> DataFrame:
    """Sharded cuckoo state over the seen set — one shuffle, one
    grouped-Arrow pack task per shard (see module docstring). The
    stash count rides the shard row (``n_stash``) so a shard driven
    past its load target is visible, never silent."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(_as_u64(pdf["h"].to_numpy(dtype=np.int64, na_value=0)))
        table, st_i, st_fp = _insert_all(u)
        return _shard_row(int(pdf["shard"].iloc[0]), len(table) // SLOTS, len(u), table, st_i, st_fp)

    return _hashed(seen, key, n_shards).groupBy("shard").applyInPandas(pack, _SHARD_SCHEMA)


def cuckoo_probe_shards(
    candidates: DataFrame, shards: DataFrame, key: str = "url_norm", n_shards: int = 64
):
    """Probe a pre-built shard table. The collected dict (n_shards
    small rows) ships as a REAL broadcast variable read inside the
    pandas UDF — never broadcast-joined (dedup.bloom_probe_shards'
    measured lesson). A candidate whose shard is absent is definitely
    new. Returns (definitely_new, maybe_seen)."""
    spark = candidates.sparkSession
    packed = {int(r["shard"]): _unpack_row(r) for r in shards.collect()}
    bc = spark.sparkContext.broadcast(packed)
    ns = n_shards

    @F.pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        tabs = bc.value
        hv = h.to_numpy(dtype=np.int64, na_value=0)
        u = _as_u64(hv)
        out = np.zeros(len(hv), dtype=bool)
        sh = hv % ns  # numpy % sign-of-divisor == F.pmod
        for s in np.unique(sh):
            ent = tabs.get(int(s))
            if ent is None:
                continue
            nb, table, st_i, st_fp, _ = ent
            idx = np.nonzero(sh == s)[0]
            out[idx] = _probe_arrays(u[idx], table, st_i, st_fp, nb)
        return pd.Series(out)

    probed = candidates.withColumn("_maybe", probe(F.xxhash64(key)))
    return (
        probed.filter(~F.col("_maybe")).drop("_maybe"),
        probed.filter(F.col("_maybe")).drop("_maybe"),
    )


def update_cuckoo_shards(
    shards: DataFrame,
    removals: DataFrame | None = None,
    additions: DataFrame | None = None,
    key: str = "url_norm",
    n_shards: int = 64,
) -> DataFrame:
    """Delta maintenance — the reason this filter exists next to the
    Bloom shards: removals delete their fingerprint in place (first
    matching slot of either bucket, else the stash), additions insert
    incrementally, and only the TOUCHED shards do any work (both
    sides of the cogroup see just the delta's shard ids plus the
    standing rows). Removals apply before additions; within each, keys
    process in sorted-hash order, so the result is deterministic.
    A shard that receives additions but has no standing row builds
    fresh. ``n_keys`` tracks live keys (a removal of a never-inserted
    key is a no-op and does not decrement).

    Capacity note: additions do not resize — a shard pushed past its
    load target degrades gracefully into the stash (audited via
    ``n_stash``); rebuild with build_cuckoo_shards when n_keys
    approaches nbuckets*SLOTS*LOAD_TARGET.
    """
    empty = shards.sparkSession.createDataFrame([], "h bigint, shard int, op int")
    ops = empty
    if removals is not None:
        ops = ops.unionByName(_hashed(removals, key, n_shards).withColumn("op", F.lit(-1)))
    if additions is not None:
        ops = ops.unionByName(_hashed(additions, key, n_shards).withColumn("op", F.lit(1)))

    def apply_ops(skey, state: pd.DataFrame, delta: pd.DataFrame) -> pd.DataFrame:
        shard = int(skey[0])
        rem = np.unique(
            _as_u64(delta.loc[delta["op"] == -1, "h"].to_numpy(dtype=np.int64, na_value=0))
        )
        add = np.unique(
            _as_u64(delta.loc[delta["op"] == 1, "h"].to_numpy(dtype=np.int64, na_value=0))
        )
        if len(state):
            nb, table, st_i, st_fp, n_keys = _unpack_row(state.iloc[0])
        elif len(add):
            table, st_i, st_fp = _insert_all(add)
            nb, n_keys = len(table) // SLOTS, len(add)
            add = add[:0]
        else:
            # removal-only delta for a shard with no standing state:
            # nothing to forget, emit nothing (typed-empty for Arrow)
            return pd.DataFrame(
                {
                    "shard": pd.Series([], dtype="int32"),
                    "nbuckets": pd.Series([], dtype="int32"),
                    "n_keys": pd.Series([], dtype="int64"),
                    "n_stash": pd.Series([], dtype="int32"),
                    "table": pd.Series([], dtype=object),
                    "stash_i": pd.Series([], dtype=object),
                    "stash_fp": pd.Series([], dtype=object),
                }
            )
        for uv in rem:
            st_i, st_fp, found = _delete_one(int(uv), table, st_i, st_fp, nb)
            n_keys -= int(found)
        for uv in add:
            st_i, st_fp = _insert_one(int(uv), table, st_i, st_fp, nb)
            n_keys += 1
        return _shard_row(shard, nb, n_keys, table, st_i, st_fp)

    return (
        shards.groupBy("shard")
        .cogroup(ops.groupBy("shard"))
        .applyInPandas(apply_ops, _SHARD_SCHEMA)
    )


def cuckoo_prefilter(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_norm",
    n_shards: int | None = None,
):
    """Cuckoo pre-probe in front of the exact anti-join — the J1 shape
    of dedup.bloom_prefilter with the deletable filter. ``n_shards``
    None resolves from the seen count (resolve_cuckoo_shards) so the
    per-shard build task stays bounded as the seen set grows. Returns
    (definitely_new, maybe_seen); exactness contract identical to the
    Bloom path (no false negatives; FPs fall through)."""
    if n_shards is None:
        n_shards = resolve_cuckoo_shards(seen.count())
    shards = build_cuckoo_shards(seen, key, n_shards)
    return cuckoo_probe_shards(candidates, shards, key, n_shards)


def dedup_new_candidates_cuckoo(
    candidates: DataFrame, seen: DataFrame, key: str = "url_norm"
) -> DataFrame:
    """Full J1 behind the cuckoo prefilter: definitely-new rows skip
    the shuffle, maybe-seen rows confirm via the exact anti-join."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.dedup import (
        seen_anti_join,
    )

    new, maybe = cuckoo_prefilter(candidates, seen, key)
    return new.unionByName(seen_anti_join(maybe, seen, key))
