"""k-means IVF: deterministic quantizer training + recall sanity vs the
brute-force baseline (operators/similarity.kmeans_ivf_topk), and
hyperplane-LSH near-dup blocking guarantees."""

from pyspark.sql import functions as F

from gliner_spark.operators.similarity import (
    _quantized,
    cosine_topk,
    embedding_neardup,
    kmeans_ivf_topk,
    train_kmeans_cells,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_deterministic_across_partitionings(spark):
    emb = _emb(spark)
    c1 = train_kmeans_cells(_quantized(emb))
    c2 = train_kmeans_cells(_quantized(emb.repartition(13)))
    assert c1 == c2
    # integer centroids (the exactness precondition for the SQL oracle)
    assert all(isinstance(x, int) for _, vec in c1 for x in vec)


def test_kmeans_ivf_recall_beats_chance(spark):
    emb = _emb(spark)
    bf = {}
    for r in cosine_topk(emb, n_queries=10, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.vec_id)
    km = {}
    for r in kmeans_ivf_topk(emb, n_queries=10, k=5).collect():
        km.setdefault(r.query_id, set()).add(r.vec_id)
    recall = sum(
        len(bf[q] & km.get(q, set())) / len(bf[q]) for q in bf
    ) / len(bf)
    # nprobe=2 of 8 cells scans ~25% of the corpus; recall must beat that
    assert recall >= 0.5, recall


def test_kmeans_sample_robust_to_sparse_offset_ids(spark):
    """The training sample hashes vec_id before the modulo (ADVICE r3):
    an offset arithmetic-progression id space (every id in one residue
    class, where a raw `vec_id % s` would select nothing) must still
    yield a full-size sample and k centroids."""
    emb = _emb(spark).withColumn(
        "vec_id", F.col("vec_id") * 7 + 1_000_003
    )
    cents = train_kmeans_cells(_quantized(emb))
    assert len(cents) == 8
    # and a too-small corpus raises instead of silently under-initializing
    tiny = _emb(spark).filter(F.col("vec_id") < 3)
    try:
        train_kmeans_cells(_quantized(tiny))
        raise AssertionError("expected ValueError for n < k")
    except ValueError as e:
        assert "sample yielded" in str(e)


def test_ivf_index_persistence_round_trip(spark, tmp_path):
    """Build-once / probe-many: centroids persist to a tiny JSON index and
    a prebuilt-quantizer query run returns identical rows with zero
    training jobs."""
    from gliner_spark.operators.similarity import load_cells, save_cells

    emb = _emb(spark)
    cents = train_kmeans_cells(_quantized(emb))
    path = str(tmp_path / "ivf_index.json")
    save_cells(cents, path)
    assert load_cells(path) == cents
    a = kmeans_ivf_topk(emb, n_queries=5, k=5).collect()
    b = kmeans_ivf_topk(emb, n_queries=5, k=5, cells=load_cells(path)).collect()
    assert a == b


def test_neardup_finds_all_identical_vectors(spark):
    """Identical vectors produce identical sign bits, so they collide in
    EVERY band: recall of exact duplicates is 1.0 by construction — the
    guarantee the label-cell blocking could not give across labels."""
    rows = []
    for i in range(20):
        base = [float(((i % 10) * 37 + d * 11) % 19 - 9) / 10 for d in range(64)]
        rows.append((i, f"lab{i % 3}", base))  # i and i+10 are identical
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup(emb, threshold=0.99).collect()
    }
    assert {(i, i + 10) for i in range(10)} <= got


def test_neardup_deterministic_across_partitionings(spark):
    emb = _emb(spark)
    a = embedding_neardup(emb, threshold=0.3).collect()
    b = embedding_neardup(emb.repartition(17), threshold=0.3).collect()
    assert a == b and len(a) > 0


def test_neardup_results_are_exact_verified(spark):
    """Every emitted pair's sim must equal the exact integer cosine — the
    LSH stage only PRUNES, never approximates the reported similarity."""
    emb = _emb(spark)
    out = embedding_neardup(emb, threshold=0.3)
    qz = _quantized(emb)
    va = qz.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"),
                   F.col("norm2").alias("na"))
    vb = qz.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"),
                   F.col("norm2").alias("nb"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    chk = (out.join(va, "vec_a").join(vb, "vec_b")
           .withColumn("expect", F.round(
               dot.cast("double")
               / F.sqrt((F.col("na") * F.col("nb")).cast("double")), 6))
           .filter(F.col("sim") != F.col("expect")))
    assert chk.count() == 0


def test_pq_codebooks_deterministic_and_shaped(spark):
    from gliner_spark.operators.similarity import train_pq_codebooks

    emb = _emb(spark)
    b1 = train_pq_codebooks(_quantized(emb))
    b2 = train_pq_codebooks(_quantized(emb.repartition(13)))
    assert b1 == b2
    assert len(b1) == 16 and all(len(bk) == 16 for bk in b1)
    assert all(len(c) == 4 for bk in b1 for c in bk)
    assert all(isinstance(x, int) for bk in b1 for c in bk for x in c)


def test_pq_adc_recall_beats_chance_and_matches_exact_reconstruction(spark):
    """ADC ranking recall vs the exact cosine baseline must beat random;
    and every reported d2 equals the brute-force python ADC distance
    (codes + distance tables recomputed independently in numpy)."""
    import numpy as np

    from gliner_spark.operators.similarity import (
        pq_topk,
        train_pq_codebooks,
    )

    emb = _emb(spark)
    got = pq_topk(emb, n_queries=10, k=5).collect()
    rows = sorted(
        _quantized(emb).select("vec_id", "q").collect(), key=lambda r: r.vec_id
    )
    X = {r.vec_id: np.array(r.q, dtype=np.int64) for r in rows}
    # ADC approximates EUCLIDEAN distance — the honest recall baseline is
    # exact L2 top-k (cosine_topk ranks a different metric)
    pq = {}
    for r in got:
        pq.setdefault(r.query_id, set()).add(r.vec_id)
    recall_n = recall_d = 0
    for qid in pq:
        q = X[qid]
        exact = sorted(
            (int(((q - x) ** 2).sum()), v) for v, x in X.items() if v != qid
        )[:5]
        want = {v for _, v in exact}
        recall_n += len(want & pq[qid])
        recall_d += len(want)
    recall = recall_n / recall_d
    assert recall >= 0.3, recall  # 16 nibble codes, small random corpus
    books = train_pq_codebooks(_quantized(emb))
    m = len(books)
    sub = 64 // m
    codes = {
        v: [
            int(
                np.argmin(
                    ((x[mi * sub:(mi + 1) * sub] - np.array(books[mi])) ** 2).sum(
                        axis=1
                    )
                )
            )
            for mi in range(m)
        ]
        for v, x in X.items()
    }
    for r in got:
        q = X[r.query_id]
        want = sum(
            int(
                (
                    (q[mi * sub:(mi + 1) * sub] - np.array(books[mi][codes[r.vec_id][mi]]))
                    ** 2
                ).sum()
            )
            for mi in range(m)
        )
        assert r.d2 == want, (r, want)


def test_ivfpq_composes_pruning_and_adc_consistently(spark):
    """IVF-PQ invariants: deterministic across partitionings; every
    returned candidate lies in one of the query's nprobe coarse cells;
    and its d2 equals the standalone PQ operator's d2 for the same pair
    (the composition changes WHICH pairs are scored, never the score)."""
    import numpy as np

    from gliner_spark.operators.similarity import (
        NPROBE,
        ivfpq_topk,
        pq_topk,
        train_kmeans_cells,
    )

    emb = _emb(spark)
    got = ivfpq_topk(emb, n_queries=10, k=5).collect()
    again = ivfpq_topk(emb.repartition(13), n_queries=10, k=5).collect()
    assert got == again and len(got) > 0

    # candidate set honors the coarse pruning
    cents = train_kmeans_cells(_quantized(emb))
    C = np.array([c for _, c in cents], dtype=np.int64)
    cell_ids = [cid for cid, _ in cents]
    rows = _quantized(emb).select("vec_id", "q").collect()
    X = {r.vec_id: np.array(r.q, dtype=np.int64) for r in rows}

    def assign(x, n):
        d2 = ((x[None, :] - C) ** 2).sum(axis=1)
        order = sorted(range(len(cell_ids)), key=lambda i: (d2[i], cell_ids[i]))
        return [cell_ids[i] for i in order[:n]]

    for r in got:
        probed = set(assign(X[r.query_id], NPROBE))
        assert assign(X[r.vec_id], 1)[0] in probed, r

    # ADC scores agree with the standalone PQ operator on shared pairs
    pq_d2 = {
        (r.query_id, r.vec_id): r.d2
        for r in pq_topk(emb, n_queries=10, k=50).collect()
    }
    shared = [r for r in got if (r.query_id, r.vec_id) in pq_d2]
    assert shared  # top IVF-PQ hits overlap the PQ top-50
    for r in shared:
        assert r.d2 == pq_d2[(r.query_id, r.vec_id)], r


def test_pq_index_persistence_round_trip(spark, tmp_path):
    """Build-once / probe-many for the composed index: coarse cells AND
    PQ codebooks persist to tiny JSON files, and a prebuilt run returns
    identical rows with zero training jobs."""
    from gliner_spark.operators.similarity import (
        ivfpq_topk,
        load_cells,
        load_pq,
        save_cells,
        save_pq,
        train_pq_codebooks,
    )

    emb = _emb(spark)
    cents = train_kmeans_cells(_quantized(emb))
    books = train_pq_codebooks(_quantized(emb))
    cp = str(tmp_path / "cells.json")
    bp = str(tmp_path / "pq.json")
    save_cells(cents, cp)
    save_pq(books, bp)
    assert load_pq(bp) == books
    a = ivfpq_topk(emb, n_queries=5, k=5).collect()
    b = ivfpq_topk(
        emb, n_queries=5, k=5, cells=load_cells(cp), books=load_pq(bp)
    ).collect()
    assert a == b


def test_pq_refine_with_full_shortlist_equals_brute_force(spark):
    """pq_refine_topk invariant: when the ADC shortlist covers the whole
    corpus, the exact re-rank IS the brute-force cosine ranking — the
    approximation only ever narrows the candidate set."""
    from gliner_spark.operators.similarity import pq_refine_topk

    emb = _emb(spark)
    n = emb.count()
    bf = [
        (r.query_id, r.vec_id, r.rank, r.sim)
        for r in cosine_topk(emb, n_queries=5, k=3).collect()
    ]
    rf = [
        (r.query_id, r.vec_id, r.rank, r.sim)
        for r in pq_refine_topk(
            emb, n_queries=5, k=3, shortlist=n
        ).collect()
    ]
    assert rf == bf and len(rf) == 15


def test_pq_refine_recall_at_least_raw_pq(spark):
    from gliner_spark.operators.similarity import pq_refine_topk, pq_topk

    emb = _emb(spark)
    bf = {}
    for r in cosine_topk(emb, n_queries=10, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.vec_id)

    def rec(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(
            len(bf[q] & got.get(q, set())) / len(bf[q]) for q in bf
        ) / len(bf)

    assert rec(pq_refine_topk(emb, shortlist=50)) >= rec(pq_topk(emb))


def test_ivfpq_refine_composes(spark):
    """r5: ivfpq_refine_topk = exact re-rank of the ivfpq shortlist; with
    nprobe == n_cells and a full shortlist it must equal brute force over
    whatever candidates the coarse index admits (here: everything)."""
    from gliner_spark.operators.similarity import ivfpq_refine_topk

    emb = _emb(spark)
    n = emb.count()
    bf = [
        (r.query_id, r.vec_id, r.rank, r.sim)
        for r in cosine_topk(emb, n_queries=5, k=3).collect()
    ]
    rf = [
        (r.query_id, r.vec_id, r.rank, r.sim)
        for r in ivfpq_refine_topk(
            emb, n_queries=5, k=3, shortlist=n, nprobe=8
        ).collect()
    ]
    assert rf == bf and len(rf) == 15


def test_semantic_clusters_invariants(spark):
    """r5 SemDeDup shape: transitive closure of verified SRP pairs,
    min-vec_id representative, exactly one keep per cluster."""
    from gliner_spark.cache import release_caches
    from gliner_spark.operators.similarity import semantic_clusters

    emb = _emb(spark)
    out = semantic_clusters(emb, threshold=0.3)
    rows = out.collect()
    release_caches(out)
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cl, members in by_cluster.items():
        ids = [m.vec_id for m in members]
        assert cl == min(ids)
        assert len(members) >= 2
        assert sum(m.keep for m in members) == 1
        assert all(m.cluster_size == len(members) for m in members)
    # closure covers every verified pair
    pairs = embedding_neardup(emb, threshold=0.3)
    cmap = {r.vec_id: r.cluster for r in rows}
    assert all(
        cmap[p.vec_a] == cmap[p.vec_b] for p in pairs.collect()
    )


def test_sq8_reconstruction_bounded_and_recall(spark):
    """r6: SQ8 codes reconstruct WITHIN the trained per-dim range with
    error <= span/255 per dim, and the asymmetric SQ8 ranking recovers
    most of the brute-force top-5 (8-bit/dim loses far less than 4-bit
    PQ subspace codes at this dim)."""
    from gliner_spark.operators.similarity import (
        _quantized,
        sq8_topk,
        train_sq8_ranges,
    )

    emb = _emb(spark)
    qz = _quantized(emb)
    ranges = train_sq8_ranges(qz)
    assert all(mn <= mx for mn, mx in ranges)
    # replay quantize->reconstruct in python on a handful of rows
    sample = qz.orderBy("vec_id").limit(5).collect()
    for row in sample:
        for j, x in enumerate(row.q):
            mn, mx = ranges[j]
            span = max(mx - mn, 1)
            code = ((x - mn) * 255) // span
            assert 0 <= code <= 255
            recon = mn + (code * span) // 255
            assert mn <= recon <= mx
            assert abs(recon - x) <= span // 255 + (span + 254) // 255
    bf = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, n_queries=10, k=5).collect()
    }
    sq = {
        (r.query_id, r.vec_id)
        for r in sq8_topk(emb, n_queries=10, k=5).collect()
    }
    recall = len(bf & sq) / len(bf)
    assert recall >= 0.8, recall


def test_retrieval_mrr_reciprocal_ranks(spark):
    """r6: per-query reciprocal rank of the brute-force top-1 within the
    SQ8 top-k — rr_micro = UNIT DIV found_rank when found, 0 when missed,
    and the gt column IS the cosine rank-1 neighbor."""
    from gliner_spark.operators.similarity import (
        MRR_UNIT,
        retrieval_mrr,
        sq8_topk,
    )

    emb = _emb(spark)
    rows = retrieval_mrr(emb, n_queries=10, k=10).collect()
    assert len(rows) == 10
    gt = {
        r.query_id: r.vec_id
        for r in cosine_topk(emb, n_queries=10, k=1).collect()
    }
    idx = {
        (r.query_id, r.vec_id): r.rank
        for r in sq8_topk(emb, n_queries=10, k=10).collect()
    }
    for r in rows:
        assert r.gt_vec_id == gt[r.query_id]
        want_rank = idx.get((r.query_id, r.gt_vec_id), 0)
        assert r.found_rank == want_rank
        assert r.rr_micro == (MRR_UNIT // want_rank if want_rank else 0)
    # the 8-bit index finds most true neighbors at this dim — MRR is high
    mrr = sum(r.rr_micro for r in rows) / (10 * MRR_UNIT)
    assert mrr >= 0.5, mrr
