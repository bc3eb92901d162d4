"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring the engine's two-tier philosophy:

* ``cosine_topk`` — brute-force exact top-k against a query vector.
  The dot product is a JVM-side ``zip_with`` + ``aggregate`` fold (no
  Python in the loop); one full scan, one ``ORDER BY LIMIT k`` which
  Spark executes as a per-partition TakeOrdered + driver merge — no
  global sort shuffle.
* ``signbit_buckets`` / ``ann_topk_bucketed`` — LSH-style bucketing on
  the sign pattern of the first ``n_bits`` dimensions. At 100 TB the
  bucket column becomes the table's partition key so a query probes
  one partition instead of scanning the corpus. Deterministic (no
  random hyperplanes), hence oracle-reproducible in SQL.

Cosines are rounded to 6 decimals so the float32->double pipeline
hashes identically across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``."""
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine_sim(v, q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def signbit_buckets(
    emb: DataFrame, n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic LSH bucket: bit i set iff embedding[i] > 0."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), i + 1) > 0, F.lit(2**i)
        ).otherwise(0)
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ann_topk_bucketed(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's
    sign-bit bucket (the scale path: bucket = partition key)."""
    qbucket = 0
    for i in range(n_bits):
        if float(query_vec[i]) > 0:
            qbucket += 2**i
    bucketed = signbit_buckets(emb, n_bits, id_col, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbucket), query_vec, k, id_col, vec_col
    )


def ann_topk_multiprobe(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multiprobe ANN: exact cosine within the query's sign-bit bucket
    PLUS every Hamming-distance-1 neighbor bucket (each single bit
    flipped — the vectors a near-boundary dimension would misplace).
    Recovers most of single-probe's recall loss for (n_bits + 1)x the
    probed volume, i.e. ~(n_bits+1)/2^n_bits of the corpus instead of
    1/2^n_bits — still a partition-pruned read when ``bucket`` is the
    table's partition key (an IN-list of n_bits+1 partition values)."""
    qbucket = 0
    for i in range(n_bits):
        if float(query_vec[i]) > 0:
            qbucket += 2**i
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(n_bits)]
    bucketed = signbit_buckets(emb, n_bits, id_col, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket").isin(probes)), query_vec, k, id_col, vec_col
    )


def _signbit_bucket_col(vec_col: str, lo: int, n_bits: int) -> Column:
    """Bucket id from the sign pattern of dims [lo, lo+n_bits)."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), lo + i + 1) > 0, F.lit(2**i)
        ).otherwise(0)
    return bucket


def multiband_signbit_buckets(
    emb: DataFrame,
    n_bands: int = 4,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) rows: band r buckets on the sign pattern of
    dims [r*n_bits, (r+1)*n_bits). One explode, no per-band union."""
    structs = [
        F.struct(
            F.lit(r).alias("band"),
            _signbit_bucket_col(vec_col, r * n_bits, n_bits).alias("bucket"),
        )
        for r in range(n_bands)
    ]
    return emb.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold via multi-band
    sign-LSH: a pair is a candidate if it collides in ANY of the
    ``n_bands`` independent sign-bit bands (band r = dims
    [r*n_bits, (r+1)*n_bits)).

    Scale design (vs the single-band variant this replaces):
    * recall — one 8-bit band misses every pair whose signs differ in
      those 8 dims; with 4 bands a near-identical pair must differ in
      all 4 bands to be missed.
    * bounded blocks — single-band bucket population grows linearly
      with the corpus at fixed n_bits (quadratic pairs). Here
      ``max_bucket_size`` keeps each (band, bucket)'s smallest
      ``max_bucket_size`` ids (deterministic), so the worst bucket
      emits <= cap^2/2 candidates. Audit what a cap drops with
      multiband_signbit_buckets().groupBy("band","bucket").count()
      BEFORE trusting capped output — never cap silently.
    * the candidate join carries only (id, band, bucket); vectors are
      re-attached to the (far smaller) DISTINCT pair set for the
      exact cosine, so the band explode never duplicates embeddings.
    """
    b = multiband_signbit_buckets(emb, n_bands, n_bits, id_col, vec_col)
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket").orderBy(id_col)
        b = (
            b.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    a_, b_ = b.alias("a"), b.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    va = F.transform(F.col("_va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("_vb"), lambda x: x.cast("double"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_sim(va, vb), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _round6_half_up(x: float) -> float:
    """Python twin of Spark's round(x, 6) (BigDecimal HALF_UP) and
    DuckDB's round — NOT python's round(), which is banker's."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _norm_py(a: list[float]) -> float:
    """Driver-side twin of _norm's fold (same order, same IEEE ops),
    so a literal centroid norm is bit-identical to the engine's."""
    import math

    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the SAME left-to-right fold as
    cosine_sim's column expression, so centroid ranking agrees with
    what the engine (and the oracle) would compute."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by rounded cosine (ties → the lowest centroid index, so
    assignment is total and engine-independent). ``centroids`` is a
    plain list of vectors — index = centroid id. Production derives it
    from k-means over a sample; the operator takes ANY list, and the
    gate uses a deterministic one (the first 16 corpus vectors) so the
    oracle can rebuild it.

    At 100 TB the assignment IS the physical layout: write the corpus
    partitioned by ``cid`` and a query reads ``nprobe`` partitions
    instead of scanning — the IVF counterpart of the signbit buckets
    above (data-adaptive cells vs fixed hyperplanes). Map-only: the
    centroid list ships as literals in the task closure (k is tens to
    thousands); zero joins, zero shuffles.

    Per-row cost is one dot-fold per centroid plus ONE row-norm: the
    centroid norms are precomputed driver-side with the same
    left-to-right double fold the column expression would run, so
    ``dot/(norm_v · lit(norm_c))`` is bit-identical to
    ``cosine_sim(v, c)`` while skipping the k redundant norm folds the
    naive form pays (array higher-order functions are interpreted, not
    codegen'd — measured 3x on the 64-dim fixture). At much higher
    dim·k, the next step is an Arrow-batched matmul UDF — traded off
    here for bit-exact oracle parity.

    Output: ``(id, vec, cid, cid_cosine)`` — every input row.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    keyed = emb.select(
        F.col(id_col), F.col(vec_col), v.alias("_v"), _norm(v).alias("_nv")
    )
    scores = F.array(
        *[
            F.round(
                _dot(
                    F.col("_v"),
                    F.array(*[F.lit(float(x)).cast("double") for x in c]),
                )
                / (F.col("_nv") * F.lit(_norm_py(c))),
                6,
            )
            for c in centroids
        ]
    )
    best = F.array_max(scores)
    return keyed.select(
        F.col(id_col),
        F.col(vec_col),
        (F.array_position(scores, best) - F.lit(1)).cast("int").alias("cid"),
        best.alias("cid_cosine"),
    )


def ivf_probe_ids(
    centroids: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` centroid ids nearest the query, ranked by rounded
    cosine (ties → lowest id). Pure driver-side config math — the
    centroid list is tiny and local, no data is touched."""
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (-_round6_half_up(_cos_py(centroids[i], query_vec)), i),
    )
    return ranked[: int(nprobe)]


def ann_topk_ivf(
    emb: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` centroid cells nearest the
    query and run the exact cosine top-k inside them — reads
    ~nprobe/n_centroids of the corpus (exactly that share once the
    table is written partitioned by ``cid``; here the filter rides the
    scan). The recall/cost dial is ``nprobe`` — same geometry as the
    multiprobe dial above, but with data-adaptive cells."""
    probes = ivf_probe_ids(centroids, query_vec, nprobe)
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
        .filter(F.col("cid").isin([int(p) for p in probes]))
        .select(F.col(id_col), F.round(cosine_sim(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(int(k))
    )


def micro_vec(vec_col: str = "embedding") -> Column:
    """array<bigint> micro-units of a float32 vector: round(1e6 · x)
    per element. The float32→double cast is exact and round is
    half-away-from-zero in both engines, so the integer vector is
    engine-independent — the currency kmeans_train's sums trade in."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(1_000_000.0), 0).cast(
            "bigint"
        ),
    )


def kmeans_stats(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd step's sufficient statistics as a DataFrame: assign
    every vector to its nearest centroid (``ivf_assign``'s rounded-
    cosine argmax, ties -> lowest cid) and reduce per cluster to the
    member count ``n`` plus the per-dimension sums ``s0..s{d-1}`` of
    the integer micro-unit vectors (``micro_vec``).

    This is the distributed inner step of ``kmeans_train`` — a
    map-only assignment fused into ONE groupBy(cid) shuffle carrying
    d+1 map-side-partial longs per cluster; the result is k rows. The
    integer sums commute, so the output is bit-identical under any
    partitioning — and under the DuckDB oracle."""
    d = len(centroids[0])
    return (
        ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
        .select("cid", micro_vec(vec_col).alias("_mv"))
        .groupBy("cid")
        .agg(
            F.count("*").alias("n"),
            *[F.sum(F.col("_mv")[i]).alias(f"s{i}") for i in range(d)],
        )
    )


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[int]]:
    """Deterministic spherical k-means (Lloyd iterations under cosine)
    — the trainer that produces ivf_assign's centroid list. Every step
    is engine-independent, so a re-run, a resume, or the DuckDB oracle
    reproduce the identical centroids:

    * init: the ``k`` lowest-id vectors (float32→double, exact);
    * assign: ivf_assign's rounded-cosine argmax, ties → lowest cid;
    * update: per-cluster per-dimension MEAN computed from integer
      micro-unit sums (``micro_vec``) — integer addition commutes, so
      the sum is independent of partitioning/aggregation order, and
      the only floating point is one fixed chain per (cid, dim):
      ``(double(sum)/n)/1e6``. An emptied cluster keeps its previous
      centroid (deterministic rule, no reseeding RNG).

    Scale shape per iteration: one map-only assignment fused with a
    groupBy(cid) aggregation carrying d+1 map-side-partial sums —
    ONE shuffle of k·(d+1) longs; the driver handles k·d numbers
    (the same bounded-collect budget as the Bloom shards). Micro sums
    hold exactly in a bigint up to ~2^53/1e6 ≈ 9·10^9 rows per
    cluster; beyond that, drop to 1e3 units or a decimal sum.

    Returns ``(centroids, sizes)`` — python lists, ready to hand to
    ivf_assign / ann_topk_ivf.
    """
    d_rows = (
        emb.filter(F.col(id_col) < k)
        .orderBy(id_col)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")))
        .collect()
    )
    cents = [list(r[0]) for r in d_rows]
    if not cents:
        raise ValueError("k-means needs at least one init vector")
    d = len(cents[0])
    sizes = [0] * len(cents)
    for _ in range(int(n_iters)):
        stats = kmeans_stats(
            emb, cents, id_col=id_col, vec_col=vec_col
        ).collect()
        by_cid = {r["cid"]: r for r in stats}
        sizes = [0] * len(cents)
        for cid, r in by_cid.items():
            n = int(r["n"])
            sizes[cid] = n
            cents[cid] = [
                (float(int(r[f"s{i}"])) / n) / 1_000_000.0 for i in range(d)
            ]
        # cids absent from by_cid keep their previous centroid
    return cents, sizes


def semdedup(
    emb: DataFrame,
    centroids: list[list[float]],
    eps: float = 0.95,
    max_cell_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication over
    k-means cells. Cluster the corpus (``ivf_assign`` against the
    given centroids — production hands it ``kmeans_train`` output),
    find within-cell pairs with cosine >= ``eps``, and in each
    eps-neighborhood KEEP the item least similar to its centroid (the
    paper's keep-low-centroid-similarity rule: prefer the diverse
    edge of the neighborhood), ties -> lowest id. Precisely: a row is
    dropped iff some same-cell eps-neighbor ranks strictly lower by
    (cid_cosine, id) — so the minimum of every eps-connected group
    always survives, and the rule is total and engine-independent.

    Scale shape: the only corpus-sized shuffles are the cell-keyed
    self-join and an id-keyed count/join-back — pairs never leave
    their cell, and a cell is 1/k of the corpus in expectation
    (k-means balance, measured by ``kmeans_train``'s sizes). For
    degenerate cells ``max_cell_size`` bounds participation: only a
    cell's first ``max_cell_size`` rows by the keep order
    (cid_cosine, id) enter the pair join; later rows pass through
    kept with ``examined = false`` — audit with a cid count BEFORE
    trusting capped output, never cap silently. At 100 TB the
    ``cid`` from this same assignment is the table's partition key,
    so the pair join reads co-located partitions.

    Output, one row per input row (full decision surface):
    ``(id, cid, cid_cosine, examined, n_sem_dups, keep)``.
    """
    a = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("cid"), F.col("cid_cosine")
    )
    if max_cell_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("cid").orderBy("cid_cosine", id_col)
        a = a.withColumn(
            "examined", F.row_number().over(w) <= int(max_cell_size)
        )
    else:
        a = a.withColumn("examined", F.lit(True))
    part = a.filter(F.col("examined"))
    l = part.select(
        F.col(id_col).alias("_ia"),
        F.col("cid").alias("_ca"),
        F.col("cid_cosine").alias("_cca"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_va"),
    )
    r = part.select(
        F.col(id_col).alias("_ib"),
        F.col("cid").alias("_cb"),
        F.col("cid_cosine").alias("_ccb"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_vb"),
    )
    pairs = (
        l.join(r, (F.col("_ca") == F.col("_cb")) & (F.col("_ia") < F.col("_ib")))
        .withColumn("_cos", F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("_cos") >= float(eps))
        .select("_ia", "_ib", "_cca", "_ccb")
    )
    directional = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_ia").alias("_id"),
                    (
                        (F.col("_ccb") < F.col("_cca"))
                        | (
                            (F.col("_ccb") == F.col("_cca"))
                            & (F.col("_ib") < F.col("_ia"))
                        )
                    ).alias("_dom"),
                ),
                F.struct(
                    F.col("_ib").alias("_id"),
                    (
                        (F.col("_cca") < F.col("_ccb"))
                        | (
                            (F.col("_cca") == F.col("_ccb"))
                            & (F.col("_ia") < F.col("_ib"))
                        )
                    ).alias("_dom"),
                ),
            )
        ).alias("_d")
    ).select(F.col("_d._id").alias("_id"), F.col("_d._dom").alias("_dom"))
    g = directional.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"), F.max("_dom").alias("_anyd")
    )
    return (
        a.join(g, a[id_col] == g["_id"], "left")
        .select(
            F.col(id_col),
            F.col("cid"),
            F.col("cid_cosine"),
            F.col("examined"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_sem_dups"),
            (~F.coalesce(F.col("_anyd"), F.lit(False))).alias("keep"),
        )
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column —
    the ANN memory lever at 100 TB: float32 vectors shrink 4x (the
    embedding table usually dominates similarity-pipeline footprint),
    and an int8 dot product stays SIMD-friendly executor-side.
    Per-vector scale = max|v| / 127 (symmetric, zero-point-free);
    code_i = round(v_i / scale) in [-127, 127]; the all-zero vector
    quantizes to all-zero codes under scale 0 (guarded division).

    Pure Catalyst array transforms — no UDF, rides the embedding
    scan. Codes stay an array column for downstream use;
    :func:`quantization_digest` projects the gate-comparable scalar
    view, and dequantized recall is pytest-pinned
    (tests/test_similarity.py) — the honest split: representation
    exact-gated, retrieval quality measured.

    Output: ``(vec_id, scale, codes array<int>)``.
    """
    v = F.col(vec_col)
    scale = (F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)).alias(
        "scale"
    )
    out = emb.select(F.col(id_col).alias("vec_id"), v.alias("_v"), scale)
    # ANSI-safe zero-vector guard: divide by 1 instead of 0 (every
    # component is 0 there, so codes come out 0 either way)
    safe = F.when(F.col("scale") == 0.0, F.lit(1.0)).otherwise(F.col("scale"))
    codes = F.transform(F.col("_v"), lambda x: F.round(x / safe).cast("int"))
    return out.select("vec_id", "scale", codes.alias("codes"))


def quantization_digest(quant: DataFrame) -> DataFrame:
    """Scalar projection of the quantized table for the exact gate
    (array cells cannot cross the driver's comparator): dims, scale,
    integer code stats and an order-committing md5 of the code list."""
    return quant.select(
        "vec_id",
        F.size("codes").cast("bigint").alias("n_dims"),
        "scale",
        F.aggregate("codes", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "code_sum"
        ),
        F.array_min("codes").cast("bigint").alias("code_min"),
        F.array_max("codes").cast("bigint").alias("code_max"),
        F.md5(F.concat_ws(",", F.col("codes"))).alias("codes_md5"),
    )


def dequantized_topk(
    quant: DataFrame,
    query_codes: list[int],
    query_scale: float,
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k over DEQUANTIZED vectors (code *
    scale) — the recall-audit twin of cosine_topk on the float
    column; same TakeOrderedAndProject shape, zero exchanges."""
    q = [c * query_scale for c in query_codes]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    deq = F.transform(F.col("codes"), lambda c: c * F.col("scale"))
    scored = quant.select(
        "vec_id",
        cosine_sim(deq, qlit).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
