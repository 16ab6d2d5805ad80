"""Stateful streaming operators: applyInPandasWithState running stats ==
batch aggregation after drain; watermarked windowed counts drop late data
and keep on-time data (two availableNow runs sharing one checkpoint —
the watermark persists in checkpoint state between runs)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gliner_spark.streaming.pipeline import (
    stream_user_stats,
    stream_windowed_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _drain_updates(stream_df, ckpt, key_cols):
    """Run availableNow, folding update-mode micro-batch output into a
    latest-value-per-key dict on the driver (test-scale only)."""
    state = {}

    def fold(batch_df, _bid):
        for r in batch_df.collect():
            state[tuple(r[c] for c in key_cols)] = r

    q = (
        stream_df.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return state


def test_stateful_user_stats_equals_batch(spark):
    src = tempfile.mkdtemp(prefix="gs_st_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_st_ckpt_")
    try:
        ev = spark.read.parquet(EVENTS)
        # two drops -> state must carry across micro-batches
        ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
        ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        got = _drain_updates(stream_user_stats(stream), ckpt, ["user_id"])

        want = {
            (r.user_id,): r
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
                F.max("ts").alias("last_ts"),
            )
            .collect()
        }
        assert got.keys() == want.keys()
        for k, w in want.items():
            g = got[k]
            assert g.n_events == w.n_events, k
            assert g.total_value == pytest.approx(w.total_value), k
            assert g.last_ts == w.last_ts, k
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_exact_dedup_first_seen_wins(spark):
    """Duplicates across micro-batches are suppressed; the kept doc per
    distinct text is deterministic (min doc_id of the first batch that
    carried it)."""
    from gliner_spark.streaming.pipeline import stream_exact_dedup

    src = tempfile.mkdtemp(prefix="gs_dd_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_dd_ckpt_")
    out = tempfile.mkdtemp(prefix="gs_dd_out_")
    try:
        rows = [
            ("doc-b", "hello world"),
            ("doc-a", "hello world"),   # same batch: min doc_id wins
            ("doc-c", "unique one"),
        ]
        rows2 = [
            ("doc-d", "hello world"),   # later batch duplicate: suppressed
            ("doc-e", "unique two"),
        ]
        ddl = "doc_id string, text string"
        spark.createDataFrame(rows, ddl).write.mode("append").parquet(src)

        def drain():
            stream = (
                spark.readStream.schema(ddl)
                .option("maxFilesPerTrigger", 100)
                .parquet(src)
            )
            q = (
                stream_exact_dedup(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        drain()
        spark.createDataFrame(rows2, ddl).write.mode("append").parquet(src)
        drain()

        got = {
            (r.text_hash, r.doc_id)
            for r in spark.read.parquet(out).collect()
        }
        import hashlib

        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
        assert got == {
            (md5("hello world"), "doc-a"),
            (md5("unique one"), "doc-c"),
            (md5("unique two"), "doc-e"),
        }
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_neardup_candidates_equal_batch(spark):
    """Candidate pairs from the stateful streaming LSH (state carried
    across TWO micro-batch drops) == batch candidate_pairs over the same
    corpus — including pairs whose two docs arrived in different
    micro-batches."""
    from gliner_spark.operators.dedup import candidate_pairs
    from gliner_spark.streaming.pipeline import stream_neardup_candidates

    src = tempfile.mkdtemp(prefix="gs_nd_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_nd_ckpt_")
    out = tempfile.mkdtemp(prefix="gs_nd_out_")
    try:
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
            .persist()
        )
        # split into two drops so buckets span micro-batches
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            stream_neardup_candidates(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        # overflowing buckets differ BY DESIGN: batch drops them
        # retroactively, the stream prefix-freezes at the cap (documented
        # in the operator). On non-overflowing buckets the two must agree
        # exactly — compare there, orientation-free (the stream
        # canonicalizes ids to strings, whose ordering differs from bigint)
        from gliner_spark.operators.dedup import (
            MAX_BUCKET,
            _band_buckets,
            minhash_signatures,
        )

        oversized = {
            (r.band, r.bkey)
            for r in _band_buckets(minhash_signatures(docs))
            .groupBy("band", "bkey")
            .count()
            .filter(F.col("count") > MAX_BUCKET)
            .collect()
        }
        got = {
            frozenset((r.doc_a, r.doc_b))
            for r in spark.read.parquet(out).collect()
            if (r.band, r.bkey) not in oversized
        }
        want = {
            frozenset((str(r.doc_a), str(r.doc_b)))
            for r in candidate_pairs(docs).collect()
        }
        assert got == want and len(want) > 0
        assert len(oversized) > 0  # the divergence case was actually hit
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_to_catalog_table(spark):
    """writeStream.toTable lands micro-batches in a catalog table (the
    Iceberg streaming-ingest seam, exercised via the default provider)."""
    from gliner_spark.streaming.pipeline import run_stream_to_table

    src = tempfile.mkdtemp(prefix="gs_tt_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_tt_ckpt_")
    loc = tempfile.mkdtemp(prefix="gs_tt_loc_")
    try:
        ev = spark.read.parquet(EVENTS).limit(40)
        ev.write.mode("append").parquet(src)
        spark.conf.set(
            "spark.sql.streaming.checkpointLocation.skipExistenceCheck", "true"
        )
        spark.sql(
            "CREATE TABLE gs_stream_tbl "
            f"({EVENTS_DDL}) USING parquet LOCATION '{loc}'"
        )
        stream = (
            spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", 100)
            .parquet(src)
        )
        q = run_stream_to_table(stream, "gs_stream_tbl", ckpt)
        q.awaitTermination(120)
        assert spark.table("gs_stream_tbl").count() == 40
    finally:
        spark.sql("DROP TABLE IF EXISTS gs_stream_tbl")
        for d in (src, ckpt, loc):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_verified_neardup_equals_batch_minhash_dedup(spark):
    """The VERIFIED streaming near-dup (LSH + exact Jaccard in bucket
    state) == batch minhash_dedup on non-overflowing buckets, with equal
    jaccard values, across a two-drop stream."""
    from gliner_spark.operators.dedup import (
        MAX_BUCKET,
        _band_buckets,
        minhash_dedup,
        minhash_signatures,
    )
    from gliner_spark.streaming.pipeline import stream_neardup_pairs

    src = tempfile.mkdtemp(prefix="gs_ndv_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_ndv_ckpt_")
    out = tempfile.mkdtemp(prefix="gs_ndv_out_")
    try:
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
            .persist()
        )
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            stream_neardup_pairs(stream, threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        oversized = {
            (r.band, r.bkey)
            for r in _band_buckets(minhash_signatures(docs))
            .groupBy("band", "bkey")
            .count()
            .filter(F.col("count") > MAX_BUCKET)
            .collect()
        }
        got = {}
        for r in spark.read.parquet(out).collect():
            if (r.band, r.bkey) not in oversized:
                got[frozenset((r.doc_a, r.doc_b))] = round(r.jaccard, 9)
        want = {
            frozenset((str(r.doc_a), str(r.doc_b))): round(r.jaccard, 9)
            for r in minhash_dedup(docs, threshold=0.5).collect()
        }
        assert got == want and len(want) > 0
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_watermark_drops_late_keeps_on_time(spark):
    src = tempfile.mkdtemp(prefix="gs_wm_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_wm_ckpt_")
    try:
        ev = spark.read.parquet(EVENTS).persist()
        t_max = ev.agg(F.max("ts")).first()[0]

        # run 1: everything except two held-back rows; advances the
        # watermark to max(ts) - 1h inside the checkpoint
        late_row = ev.orderBy("ts").first()          # hours before t_max
        on_time = ev.orderBy(F.desc("ts")).first()   # == t_max (in watermark)
        held_ids = {late_row.event_id, on_time.event_id}
        first = ev.filter(~F.col("event_id").isin(list(held_ids)))
        first.write.mode("append").parquet(src)

        def mk_stream():
            return (
                spark.readStream.schema(EVENTS_DDL)
                .option("maxFilesPerTrigger", 100)
                .parquet(src)
            )

        got = _drain_updates(
            stream_windowed_counts(mk_stream()), ckpt,
            ["win_start", "event_type"],
        )

        # run 2 (same checkpoint): the two held-back rows arrive "late"
        ev.filter(F.col("event_id").isin(list(held_ids))).write.mode(
            "append"
        ).parquet(src)
        got2 = _drain_updates(
            stream_windowed_counts(mk_stream()), ckpt,
            ["win_start", "event_type"],
        )
        got.update(got2)

        # expected: all of run 1 + the on-time row; the late row dropped
        expect_events = first.unionByName(
            ev.filter(F.col("event_id") == on_time.event_id)
        )
        want = {
            (r.win_start, r.event_type): r.n
            for r in expect_events.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n")
            .collect()
        }
        got_counts = {k: v.n for k, v in got.items()}
        assert got_counts == want
        # sanity: the late row's window was NOT incremented to the full
        # batch count (i.e. the drop actually happened)
        full = {
            (r.win_start, r.event_type): r.n
            for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n")
            .collect()
        }
        assert got_counts != full
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_finalize_clusters_equals_batch_duplicate_clusters(spark):
    """r6 (VERDICT ask #6): streamed verified pairs + finalize-time
    closure == batch duplicate_clusters on non-overflowing buckets — the
    streaming path now also answers 'which doc do I keep'. Overflowing
    buckets are excluded the same way the pair-equality test above does:
    a frozen streaming bucket still emits its pre-freeze pairs, while
    batch capped_filter drops the whole over-cap bucket."""
    from gliner_spark.cache import release_caches
    from gliner_spark.operators.dedup import (
        MAX_BUCKET,
        _band_buckets,
        duplicate_clusters,
        minhash_signatures,
    )
    from gliner_spark.streaming.pipeline import (
        finalize_duplicate_clusters,
        stream_neardup_pairs,
    )

    src = tempfile.mkdtemp(prefix="gs_ndc_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_ndc_ckpt_")
    out = tempfile.mkdtemp(prefix="gs_ndc_out_")
    try:
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
            .persist()
        )
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            stream_neardup_pairs(stream, threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        oversized = (
            _band_buckets(minhash_signatures(docs))
            .groupBy("band", "bkey")
            .count()
            .filter(F.col("count") > MAX_BUCKET)
            .select("band", "bkey")
        )
        streamed = spark.read.parquet(out).join(
            oversized, ["band", "bkey"], "left_anti"
        )
        got = sorted(
            (r.doc_id, r.cluster, r.cluster_size, r.keep)
            for r in finalize_duplicate_clusters(streamed).collect()
        )
        # the stream casts doc_id to string, so its closure MIN is
        # lexicographic — feed batch the same string ids so the
        # representative choice is comparable
        batch = duplicate_clusters(
            docs.withColumn("doc_id", F.col("doc_id").cast("string")),
            threshold=0.5,
        )
        want = sorted(
            (r.doc_id, r.cluster, r.cluster_size, r.keep)
            for r in batch.collect()
        )
        release_caches(batch)
        assert got == want and len(want) > 0
    finally:
        docs.unpersist()
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_hll_registers_equal_batch(spark):
    """r6: HLL registers maintained by the built-in streaming max over
    two micro-batch drops equal batch hll_build over the union — the
    cell-wise-max merge rule IS the streaming state."""
    from gliner_spark.operators.sketches import hll_build
    from gliner_spark.streaming.pipeline import stream_hll_registers

    src = tempfile.mkdtemp(prefix="gs_hll_src_")
    ckpt = tempfile.mkdtemp(prefix="gs_hll_ckpt_")
    try:
        rows = [
            ("d0", "s", f"p{i % 3}", f"obj-{i}", "t", "t", 1.0)
            for i in range(300)
        ]
        ddl = (
            "doc_id string, subj string, pred string, obj string, "
            "subj_type string, obj_type string, score double"
        )
        batch = spark.createDataFrame(rows, ddl)
        batch.filter(F.col("obj") < "obj-2").write.mode("append").parquet(src)
        batch.filter(F.col("obj") >= "obj-2").write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        got = _drain_updates(
            stream_hll_registers(stream), ckpt, ["pred", "bucket"]
        )
        want = {
            (r.pred, r.bucket): r.m for r in hll_build(batch).collect()
        }
        assert {k: v.m for k, v in got.items()} == want
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)
