"""Memory-aware Arrow batch sizing (reference serve/memory.py analog)."""

from pyspark.sql import functions as F

from gliner_spark.core.batching import calibrate_arrow_batch, estimate_doc_bytes
from gliner_spark.sources.synth import synth_docs


def test_calibration_scales_inverse_to_doc_size(spark):
    docs = synth_docs(spark, 300, partitions=4)
    small = calibrate_arrow_batch(docs, target_mb=32)
    big_docs = docs.withColumn("pad", F.repeat(F.lit("x"), 50_000))
    big = calibrate_arrow_batch(big_docs, target_mb=32)
    assert big < small
    assert 64 <= big <= 65536 and 64 <= small <= 65536
    # ~32MB / measured bytes, within clamp
    bytes_big = estimate_doc_bytes(big_docs)
    assert big == max(64, min(65536, int(32 * (1 << 20) / bytes_big)))
