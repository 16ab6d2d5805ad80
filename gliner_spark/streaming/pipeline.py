"""Structured Streaming ingest for the scoring stage.

The reference is request/batch oriented (SURVEY §2.9) — its closest analog
is Ray Serve dynamic batching (serve/server.py:619-622). Our scoring stage
is STATELESS per document, so it lifts onto a stream unchanged: the same
mapInPandas extraction runs on a streaming DataFrame; micro-batches play
the role of dynamic batches; no watermark or stateful operator is needed.

Pattern for the stateful follow-on stages (linking/canonicalization):
foreachBatch — each micro-batch appends mentions/triples_raw via the same
bucketed writer as the batch pipeline, and finalize_graph() runs on demand;
exactly the lambda-architecture split the lineage design already supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gliner_spark.core.model import GlinerSparkModel
from gliner_spark.operators.extraction import extract_graph
from gliner_spark.sources.synth import DOCS_DDL


def streaming_docs(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of interleaved docs (parquet drops into `path`).

    maxFilesPerTrigger bounds micro-batch size — the backpressure analog of
    the reference's memory-aware batch sizing (serve/memory.py)."""
    return (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def stream_extract(docs_stream: DataFrame, model: GlinerSparkModel) -> DataFrame:
    """Streaming mention+triple extraction — identical UDF as batch."""
    return extract_graph(docs_stream, model)


def run_stream_to_parquet(
    graph_stream: DataFrame, out_path: str, checkpoint: str, available_now: bool = True
):
    """Materialize the stream; availableNow drains all pending input then
    stops (used by tests and backfill runs)."""
    w = (
        graph_stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
