"""Mixed streaming+batch ingestion and resume-hygiene regressions.

- Streamed micro-batches land in a staging layout (base/stream/*); a later
  batch run over the SAME base must not delete them (round-1 ADVICE: the
  old shared layout lost streamed rows to dynamic partition overwrite).
- A doc extracted by BOTH paths counts once (batch supersedes stream).
- Partial files from a crashed attempt in a pending bucket are cleared even
  when the re-run writes zero rows for that partition (phantom-row fix).
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gliner_spark.presets import default_model
from gliner_spark.sinks.materialize import finalize_graph, run_pipeline
from gliner_spark.sources.synth import synth_docs
from gliner_spark.streaming.pipeline import run_stream_pipeline

MODEL = default_model()


def _graph_sets(spark, base):
    out = {}
    for tbl in ("entities", "triples"):
        df = spark.read.parquet(f"{base}/{tbl}")
        cols = sorted(c for c in df.columns if c != "bucket")
        out[tbl] = sorted(map(tuple, df.select(*cols).collect()))
    return out


def test_stream_then_batch_no_data_loss(spark):
    """Stream half the corpus, batch-run the other half into the same base:
    finalize sees the union — identical graph to a one-shot batch run."""
    src = tempfile.mkdtemp(prefix="gs_mm_src_")
    base = tempfile.mkdtemp(prefix="gs_mm_base_")
    base_ref = tempfile.mkdtemp(prefix="gs_mm_ref_")
    ckpt = tempfile.mkdtemp(prefix="gs_mm_ckpt_")
    try:
        docs = synth_docs(spark, 120, partitions=4).persist()
        first = docs.filter(F.crc32("doc_id") % 2 == 0)
        second = docs.filter(F.crc32("doc_id") % 2 == 1)

        first.write.mode("overwrite").parquet(src)
        q = run_stream_pipeline(spark, src, base, MODEL, ckpt)
        q.awaitTermination(180)

        run_pipeline(spark, second, MODEL, base)  # batch into the SAME base
        run_pipeline(spark, docs, MODEL, base_ref)  # one-shot reference

        assert _graph_sets(spark, base) == _graph_sets(spark, base_ref)
    finally:
        for d in (src, base, base_ref, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_overlapped_by_batch_counts_once(spark):
    """Batch re-extracts docs that were already streamed: batch supersedes,
    nothing double-counts."""
    src = tempfile.mkdtemp(prefix="gs_ov_src_")
    base = tempfile.mkdtemp(prefix="gs_ov_base_")
    base_ref = tempfile.mkdtemp(prefix="gs_ov_ref_")
    ckpt = tempfile.mkdtemp(prefix="gs_ov_ckpt_")
    try:
        docs = synth_docs(spark, 100, partitions=4).persist()
        docs.filter(F.crc32("doc_id") % 3 == 0).write.mode("overwrite").parquet(src)
        q = run_stream_pipeline(spark, src, base, MODEL, ckpt)
        q.awaitTermination(180)

        run_pipeline(spark, docs, MODEL, base)      # covers streamed docs too
        run_pipeline(spark, docs, MODEL, base_ref)  # batch-only reference

        assert _graph_sets(spark, base) == _graph_sets(spark, base_ref)
    finally:
        for d in (src, base, base_ref, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_phantom_partials_cleared(spark):
    """Plant a crashed attempt's partial file in a pending bucket: the
    re-run must remove it even if dynamic overwrite wouldn't."""
    base = tempfile.mkdtemp(prefix="gs_ph_base_")
    try:
        phantom = spark.createDataFrame(
            [("doc-PHANTOM", 0, 0, 1, "x", "person", 0.9, "x", 3)],
            "doc_id string, ent_idx int, start int, end int, text string, "
            "label string, score double, norm string, bucket int",
        )
        phantom.write.mode("append").partitionBy("bucket").parquet(
            f"{base}/mentions"
        )
        docs = synth_docs(spark, 80, partitions=4)
        run_pipeline(spark, docs, MODEL, base)
        m = spark.read.parquet(f"{base}/mentions")
        assert m.filter(F.col("doc_id") == "doc-PHANTOM").count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
