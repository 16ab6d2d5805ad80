"""Skew-guard observability ("no silent caps", VERDICT r3 #2): every LSH
bucket / hub-fanout cap carries a 1-row AUDIT aggregate on the operator
output; skew_metrics(df) collects each with one small aggregate job over
the cap site's (usually persisted) input. The streaming prefix-freeze
counts skips in state and surfaces them as opt-in sentinel rows.
(CollectMetrics/Observation was rejected — see metrics.py docstring: the
LSH self-joins dedup the observed node to an empty metrics row.)"""

import shutil
import tempfile

from pyspark.sql import functions as F

from gliner_spark.metrics import skew_metrics


def test_minhash_bucket_cap_is_observed(spark):
    """210 identical docs overflow every band bucket (MAX_BUCKET=200):
    all candidate rows are dropped, and the observation reports exactly
    210 rows x 4 bands dropped with max group size 210."""
    from gliner_spark.operators.dedup import minhash_dedup

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(210)],
        "doc_id long, text string",
    )
    out = minhash_dedup(docs, threshold=0.5)
    assert out.count() == 0  # every bucket over cap -> no candidates
    m = skew_metrics(out)
    assert m["dedup_lsh_bucket_cap"]["n_dropped_rows"] == 210 * 4
    assert m["dedup_lsh_bucket_cap"]["max_group_size"] == 210
    assert m["dedup_lsh_bucket_cap"]["cap"] == 200


def test_minhash_under_cap_reports_zero(spark):
    from gliner_spark.operators.dedup import minhash_dedup

    docs = spark.createDataFrame(
        [(i, f"unique{i} token{i} word{i} item{i}") for i in range(100)],
        "doc_id long, text string",
    )
    out = minhash_dedup(docs, threshold=0.5)
    out.count()
    m = skew_metrics(out)
    assert m["dedup_lsh_bucket_cap"]["n_dropped_rows"] == 0
    assert 0 < m["dedup_lsh_bucket_cap"]["max_group_size"] <= 200


def test_two_hop_hub_cap_is_observed(spark):
    from gliner_spark.operators.graph_analytics import two_hop_paths

    rows = [("d0", "x", "r", f"y{i}", "t", "t", 1.0) for i in range(5)]
    rows += [("d0", "w", "r", "x", "t", "t", 1.0),
             ("d0", "a", "r", "b", "t", "t", 1.0),
             ("d0", "b", "r", "c", "t", "t", 1.0)]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    out = two_hop_paths(t, max_fanout=3)
    got = {(r.src, r.dst) for r in out.collect()}
    assert got == {("a", "c")}  # hub x excluded
    m = skew_metrics(out)
    # x's 5 out-edges were dropped from the mid side
    assert m["two_hop_hub_cap"]["n_dropped_rows"] == 5
    assert m["two_hop_hub_cap"]["max_group_size"] == 5
    assert m["two_hop_hub_cap"]["cap"] == 3


def test_neardup_srp_cap_is_observed(spark):
    from gliner_spark.operators.similarity import embedding_neardup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_neardup(emb, threshold=0.3)
    out.count()
    m = skew_metrics(out)
    assert "neardup_srp_bucket_cap" in m
    assert m["neardup_srp_bucket_cap"]["n_dropped_rows"] >= 0


def test_streaming_frozen_bucket_emits_skip_metric(spark):
    """6 identical docs into a max_bucket=3 stream: each band bucket
    freezes after 3 members; emit_skip_metrics surfaces the cumulative
    per-bucket skip count as sentinel rows."""
    from gliner_spark.streaming.pipeline import stream_neardup_pairs

    src = tempfile.mkdtemp(prefix="gs_frz_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_frz_ckpt_")
    out = tempfile.mkdtemp(prefix="gs_frz_out_")
    try:
        docs = spark.createDataFrame(
            [(i, "zeta eta theta iota") for i in range(6)],
            "doc_id long, text string",
        )
        docs.write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string").parquet(src)
        )
        q = (
            stream_neardup_pairs(
                stream, threshold=0.5, max_bucket=3, emit_skip_metrics=True
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        frozen = [r for r in rows if r.doc_a == "__frozen_bucket__"]
        pairs = [r for r in rows if r.doc_a != "__frozen_bucket__"]
        # 4 bands x (6 - 3 stored) skipped docs, one sentinel row per bucket
        assert len(frozen) == 4
        assert all(r.jaccard == 3.0 for r in frozen)
        # the stored prefix still verified: 3 members -> 3 pairs per band
        assert len(pairs) == 4 * 3
        assert all(r.jaccard == 1.0 for r in pairs)
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_default_stream_neardup_emits_no_sentinels(spark):
    """emit_skip_metrics defaults OFF: output schema/rows unchanged for
    existing consumers even when buckets freeze."""
    from gliner_spark.streaming.pipeline import stream_neardup_pairs

    src = tempfile.mkdtemp(prefix="gs_frz2_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_frz2_ckpt_")
    out = tempfile.mkdtemp(prefix="gs_frz2_out_")
    try:
        spark.createDataFrame(
            [(i, "mu nu xi omicron") for i in range(6)],
            "doc_id long, text string",
        ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string").parquet(src)
        )
        q = (
            stream_neardup_pairs(stream, threshold=0.5, max_bucket=3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        assert all(r.doc_a != "__frozen_bucket__" for r in rows)
        assert len(rows) == 4 * 3
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)
