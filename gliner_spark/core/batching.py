"""Memory-aware Arrow batch sizing.

Reference: gliner/serve/memory.py:23-170 — the serving stack calibrates
per-sample memory from measured examples and sizes dynamic batches to a
memory budget. The Spark analog: Arrow batch row-count
(spark.sql.execution.arrow.maxRecordsPerBatch) is the unit the scoring UDF
receives; a fixed count is wrong in both directions when doc sizes vary
1000x (tiny batches = per-batch overhead; huge batches = executor OOM at
the Arrow boundary). Calibrate bytes/doc on a deterministic sample and set
records-per-batch to fit a target batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_doc_bytes(docs: DataFrame, sample_rows: int = 256) -> float:
    """Average serialized doc size (bytes) over a deterministic sample —
    JSON length is a stable proxy for the Arrow wire size of nested rows."""
    row = (
        docs.limit(sample_rows)
        .select(
            F.avg(
                F.length(F.to_json(F.struct(*docs.columns)))
            ).alias("avg_bytes")
        )
        .first()
    )
    return float(row.avg_bytes or 1.0)


def calibrate_arrow_batch(
    docs: DataFrame,
    target_mb: int = 32,
    sample_rows: int = 256,
    floor: int = 64,
    cap: int = 65536,
) -> int:
    """Records-per-batch so one Arrow batch ≈ target_mb (clamped).

    Apply with:
        n = calibrate_arrow_batch(docs, cfg.arrow_target_mb)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", n)
    """
    avg = estimate_doc_bytes(docs, sample_rows)
    n = int(target_mb * (1 << 20) / max(avg, 1.0))
    return max(floor, min(cap, n))
