"""Similarity search: exact cosine top-k, sign-bucket ANN, near-dup."""

import math

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import similarity


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [1.0, 0.01, 0.0, 0.0]),  # closest to 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark):
    out = similarity.cosine_topk(_emb(spark), [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in out] == [0, 4, 1]
    assert out[0].cosine == 1.0
    expect1 = round(0.9 / math.hypot(0.9, 0.1), 6)
    assert abs(out[2].cosine - expect1) < 1e-6


def test_ann_bucketed_filters_bucket(spark):
    # query bucket = sign bits of first 4 dims: only dim0>0 -> bucket 1
    out = similarity.ann_topk_bucketed(
        _emb(spark), [1.0, 0.0, 0.0, 0.0], k=10, n_bits=4
    ).collect()
    ids = {r.vec_id for r in out}
    assert 3 not in ids and 2 not in ids  # other buckets
    assert 0 in ids
    # 1 and 4 have dim1>0 -> bucket 3, excluded: documented LSH trade-off
    assert ids == {0}


def test_neardup_pairs(spark):
    out = similarity.embedding_neardup_pairs(
        _emb(spark), threshold=0.99, n_bits=2, n_bands=2
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 4) in pairs  # band-0 collision (dim0>0, dim1>0), cosine ~0.9995
    assert all(a < b for a, b in pairs)


def test_neardup_multiband_recall(spark):
    """A pair differing only in band-0 signs is still found through
    band 1 — the recall the single-band variant lacked."""
    rows = [
        (0, [1.0, 1.0, 0.5, 0.5]),
        (1, [-0.001, 1.0, 0.5, 0.5]),  # band 0 differs (dim0 sign flips)
        (2, [-1.0, -1.0, -0.5, -0.5]),  # opposite everywhere
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    multi = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardup_pairs(
            emb, threshold=0.70, n_bits=2, n_bands=2
        ).collect()
    }
    assert (0, 1) in multi  # cosine ~0.774, caught via band 1 (dims 2,3 agree)
    single = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardup_pairs(
            emb, threshold=0.70, n_bits=2, n_bands=1
        ).collect()
    }
    assert (0, 1) not in single  # the single-band miss, demonstrated


def test_neardup_bucket_cap_deterministic(spark):
    rows = [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.embedding_neardup_pairs(
        emb, threshold=0.5, n_bits=2, n_bands=2, max_bucket_size=3
    ).collect()
    # cap keeps ids 0,1,2 per bucket -> exactly C(3,2) pairs
    assert {(r.id_a, r.id_b) for r in out} == {(0, 1), (0, 2), (1, 2)}


def test_ann_multiprobe_superset_of_single_probe(spark, sf_small):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import (
        similarity,
    )
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.sources.tables import (
        load,
    )

    emb = load(spark, sf_small, "embeddings")
    q = list(emb.filter("vec_id = 0").head()["embedding"])
    single = similarity.ann_topk_bucketed(emb, q, k=50, n_bits=8)
    multi = similarity.ann_topk_multiprobe(emb, q, k=50, n_bits=8)
    s = {(r.vec_id, r.cosine) for r in single.collect()}
    m = {(r.vec_id, r.cosine) for r in multi.collect()}
    # every single-probe hit is reachable by multiprobe, and the probed
    # pool is strictly larger here (neighbor buckets are non-empty)
    assert len(m) >= len(s)
    # rank-wise dominance: multiprobe's candidate pool is a superset of
    # single-probe's, so at every rank i its i-th best cosine is >= the
    # single-probe i-th best
    m_sorted = sorted((c for _, c in m), reverse=True)
    s_sorted = sorted((c for _, c in s), reverse=True)
    for mc, sc in zip(m_sorted, s_sorted):
        assert mc >= sc
    if s and m:
        exact = similarity.cosine_topk(emb, q, k=50)
        e = {(r.vec_id, r.cosine) for r in exact.collect()}
        # recall vs exact can only improve with more probes
        assert len(m & e) >= len(s & e)


def test_ivf_assign_nearest_cell_and_tiebreak(spark):
    """Each vector lands in its nearest centroid's cell; an exact
    cosine tie picks the LOWEST centroid index."""
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    out = {
        r.vec_id: (r.cid, r.cid_cosine)
        for r in similarity.ivf_assign(_emb(spark), cents).collect()
    }
    # centroid 2 duplicates centroid 0 -> ties always resolve to cid 0
    assert out[0] == (0, 1.0)
    assert out[4][0] == 0
    assert out[2] == (1, 1.0)
    assert out[3][0] in (0, 1)  # opposite of c0: cos -1 vs 0 -> cid 1
    assert out[3] == (1, 0.0)


def test_ivf_probe_ids_ranking(spark):
    cents = [[0.0, 1.0], [1.0, 0.0], [0.7, 0.7]]
    assert similarity.ivf_probe_ids(cents, [1.0, 0.0], 2) == [1, 2]
    # tie between identical centroids -> lowest id first
    assert similarity.ivf_probe_ids(
        [[1.0, 0.0], [1.0, 0.0]], [1.0, 0.0], 2
    ) == [0, 1]


def test_ivf_probe_all_equals_exact_topk(spark, sf_small):
    """nprobe = n_centroids makes IVF lossless: the probed union is the
    whole corpus, so the top-k must equal brute force exactly — the
    completeness anchor of the recall/cost dial."""
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cents = [
        list(r.embedding)
        for r in emb.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    q = list(emb.filter("vec_id = 0").head().embedding)
    exact = [
        (r.vec_id, r.cosine)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    ]
    ivf = [
        (r.vec_id, r.cosine)
        for r in similarity.ann_topk_ivf(emb, cents, q, k=10, nprobe=8).collect()
    ]
    assert ivf == exact
    # and narrowing the probe set can only shrink/degrade, never error
    narrow = similarity.ann_topk_ivf(emb, cents, q, k=10, nprobe=1).collect()
    assert 0 < len(narrow) <= 10
    assert narrow[0].vec_id == 0  # the query's own cell is probed first


def test_kmeans_train_deterministic_and_partition_invariant(spark, sf_small):
    """The trainer's whole chain is engine-independent: integer micro
    sums commute, so retraining on a differently-partitioned input
    yields bit-identical centroids and sizes."""
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    c_a, s_a = similarity.kmeans_train(emb, k=4, n_iters=2)
    c_b, s_b = similarity.kmeans_train(emb.repartition(13), k=4, n_iters=2)
    assert c_a == c_b and s_a == s_b
    assert sum(s_a) == emb.count()  # every vector lands in exactly one cell
    assert len(c_a) == 4 and all(len(c) == len(c_a[0]) for c in c_a)


def test_kmeans_emptied_cell_keeps_centroid(spark):
    """A cell that loses every member keeps its previous centroid
    (deterministic rule, no RNG reseeding): vec 1 duplicates vec 0, so
    the assignment tie-break sends both to cid 0 and cell 1 empties."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, sizes = similarity.kmeans_train(emb, k=2, n_iters=1)
    assert sizes == [3, 0]
    assert cents[1] == [1.0, 0.0]  # the init vector of vec_id 1, untouched


def test_kmeans_improves_ivf_cell_cohesion(spark, sf_small):
    """Trained centroids beat the arbitrary first-k init on the IVF
    quality metric that matters for probe recall: the mean cosine of
    each vector to its own cell centroid."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    init = [
        list(r.embedding)
        for r in emb.filter("vec_id < 4").orderBy("vec_id").collect()
    ]
    trained, _ = similarity.kmeans_train(emb, k=4, n_iters=3)

    def cohesion(cents):
        return (
            similarity.ivf_assign(emb, cents)
            .agg(F.avg("cid_cosine"))
            .head()[0]
        )

    assert cohesion(trained) > cohesion(init)


def test_semdedup_keeps_least_centroid_similar(spark):
    """SemDeDup keep rule: in an eps-neighborhood, the item LEAST
    similar to its centroid survives; everything it dominates drops.
    Cell 1's three near-identical vectors -> exactly one kept, and it
    is the one angled furthest from the centroid."""
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (0, [1.0, 0.05, 0.0, 0.0]),   # cell 0, no eps-neighbor
        (1, [0.0, 1.0, 0.0, 0.0]),    # cell 1, cid_cosine = 1.0
        (2, [0.01, 1.0, 0.0, 0.0]),   # cell 1, near-dup of 1
        (3, [0.05, 1.0, 0.0, 0.0]),   # cell 1, near-dup, furthest from centroid
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in similarity.semdedup(emb, cents, eps=0.99).collect()}
    assert out[0].keep and out[0].n_sem_dups == 0 and out[0].cid == 0
    # 1,2,3 pairwise cosine > 0.99; keeper = lowest cid_cosine = vec 3
    assert [out[i].cid for i in (1, 2, 3)] == [1, 1, 1]
    assert out[3].keep and not out[1].keep and not out[2].keep
    assert out[1].n_sem_dups == 2 and out[2].n_sem_dups == 2 and out[3].n_sem_dups == 2
    assert all(out[i].examined for i in (0, 1, 2, 3))


def test_semdedup_eps_connected_minimum_survives(spark):
    """Chain a~b, b~c with a!~c: the global minimum of the component
    always survives; c also survives because its only neighbor b is
    dominated-ranked above it? No — c drops only if a neighbor ranks
    BELOW it. Pin the per-pair dominance semantics on a 3-chain."""
    cents = [[1.0, 0.0, 0.0, 0.0]]
    # angles chosen so cos(a,b)>=eps, cos(b,c)>=eps, cos(a,c)<eps
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # cid_cos = 1.0 (highest)
        (1, [1.0, 0.25, 0.0, 0.0]),      # middle
        (2, [1.0, 0.52, 0.0, 0.0]),      # lowest cid_cos (furthest out)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in similarity.semdedup(emb, cents, eps=0.97).collect()}
    assert out[0].n_sem_dups == 1 and out[1].n_sem_dups == 2 and out[2].n_sem_dups == 1
    # 2 has the lowest cid_cosine -> keeps; 1 is dominated by 2; 0 by 1
    assert out[2].keep and not out[1].keep and not out[0].keep


def test_semdedup_cell_cap_pass_through(spark):
    """Rows beyond max_cell_size pass through kept and unexamined —
    never silently dropped — and the participants are the first rows
    by the keep order (cid_cosine, id)."""
    cents = [[0.0, 1.0, 0.0, 0.0]]
    rows = [
        (0, [0.0, 1.0, 0.0, 0.0]),
        (1, [0.01, 1.0, 0.0, 0.0]),
        (2, [0.02, 1.0, 0.0, 0.0]),
        (3, [0.03, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in
           similarity.semdedup(emb, cents, eps=0.99, max_cell_size=2).collect()}
    # keep order is cid_cosine asc: vec 3 (furthest), then 2, then 1, then 0
    assert out[3].examined and out[2].examined
    assert not out[1].examined and not out[0].examined
    assert out[1].keep and out[0].keep and out[1].n_sem_dups == 0
    # among participants, 3 dominates 2
    assert out[3].keep and not out[2].keep


def test_semdedup_partitioning_invariant(spark, sf_small):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cents = [list(r["embedding"]) for r in
             emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()]
    a = similarity.semdedup(emb, cents, eps=0.25).orderBy("vec_id").collect()
    b = (
        similarity.semdedup(emb.repartition(7), cents, eps=0.25)
        .orderBy("vec_id")
        .collect()
    )
    assert a == b
    assert any(not r.keep for r in a)  # non-trivial at sf0.001


def test_quantization_roundtrip_and_recall(spark):
    """int8 quantization: codes bounded to [-127,127], zero vector
    guarded, and dequantized top-10 keeps >=0.9 recall vs the float
    scan on a deterministic 64-dim corpus."""
    import numpy as np

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.similarity import (
        cosine_topk,
        dequantized_topk,
        quantize_embeddings,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 64)).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(200)]
    rows.append((200, [0.0] * 64))  # zero vector
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    quant = quantize_embeddings(emb).cache()

    stats = {r.vec_id: r for r in quant.collect()}
    assert all(
        max(abs(c) for c in r.codes) <= 127 for r in stats.values() if any(r.codes)
    )
    z = stats[200]
    assert z.scale == 0.0 and all(c == 0 for c in z.codes)

    # retrieval audit over the nonzero corpus (cosine of the zero
    # vector is undefined in the float path too)
    qv = [float(x) for x in vecs[0]]
    exact = [
        r.vec_id for r in cosine_topk(emb.filter("vec_id < 200"), qv, k=10).collect()
    ]
    qrow = stats[0]
    deq = [
        r.vec_id
        for r in dequantized_topk(
            quant.filter("vec_id < 200"), qrow.codes, qrow.scale, k=10
        ).collect()
    ]
    recall = len(set(exact) & set(deq)) / 10
    assert recall >= 0.9, f"int8 recall {recall}"
    quant.unpersist()
