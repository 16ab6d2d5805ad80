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


def test_cms_streaming_build_equals_batch(spark, tmp_path):
    """The sketch's cell-wise-sum mergeability makes the streaming build a
    plain streaming aggregation: cms_build applied UNCHANGED to a
    streaming DataFrame (it is pure transformations) in complete mode must
    equal the batch grid exactly once all files are consumed."""
    src = str(tmp_path / "cms_src")
    try:
        docs = spark.read.parquet(DOCS).select("doc_id", "text")
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            cms_build(stream)
            .writeStream.format("memory")
            .queryName("cms_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = _cells(spark.table("cms_stream"))
        want = _cells(cms_build(docs))
        assert got == want and len(want) > 0
    finally:
        try:
            spark.catalog.dropTempView("cms_stream")
        except Exception:
            pass
