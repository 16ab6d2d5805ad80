"""k-means IVF: deterministic quantizer training + recall sanity vs the
brute-force baseline (operators/similarity.kmeans_ivf_topk)."""

from gliner_spark.operators.similarity import (
    _quantized,
    cosine_topk,
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
