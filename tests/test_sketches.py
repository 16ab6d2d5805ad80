"""Count-min sketch: overestimate guarantee, exact mergeability (the
distributed/streaming property), and partitioning determinism."""

from pyspark.sql import functions as F

from gliner_spark.operators.sketches import cms_build, cms_estimate_topk

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _cells(df):
    return {(r.j, r.bucket): r.cnt for r in df.collect()}


def test_cms_never_underestimates_and_orders(spark):
    docs = spark.read.parquet(DOCS)
    rows = cms_estimate_topk(docs, k=25).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.n_cms >= r.n_exact, r
    keys = [(-r.n_exact, r.tok) for r in rows]
    assert keys == sorted(keys)
    # the estimate is bounded: total mass / width above exact on average
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first().n
    assert all(r.n_cms - r.n_exact <= total for r in rows)


def test_cms_merges_by_cell_sum(spark):
    """sketch(A ∪ B) == sketch(A) + sketch(B) cell-wise — the partial-
    aggregate property that makes the build a single map-side-combined
    pass at any scale (and micro-batch-additive in streaming)."""
    docs = spark.read.parquet(DOCS)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = _cells(cms_build(docs))
    ca, cb = _cells(cms_build(a)), _cells(cms_build(b))
    merged = {}
    for d in (ca, cb):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_cms_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(DOCS)
    x = sorted(map(tuple, cms_estimate_topk(docs).collect()))
    y = sorted(map(tuple, cms_estimate_topk(docs.repartition(13)).collect()))
    assert x == y
