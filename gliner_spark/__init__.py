"""gliner_spark — a PySpark-native knowledge-graph construction engine.

Built from scratch around the span-based zero-shot NER semantics of the
reference (urchade/GLiNER): triple extraction, entity linking,
canonicalization and graph materialization over interleaved text+media
document tables, expressed as Spark DataFrame plans plus vectorized
Arrow/pandas UDF stages (never per-row Python).

Layout
------
core/       pure-numpy scoring library (tokenize, span enum, score head,
            greedy decode) — the per-document math, fully testable without
            Spark and mirroring the reference's semantics
            (gliner/decoding/decoder.py, gliner/data_processing/utils.py).
operators/  DataFrame-level operators: mention extraction (mapInPandas),
            triple extraction, entity linking + connected components,
            dedup family, similarity search, text analysis, evaluation.
sources/    deterministic corpus synthesis + table readers.
sinks/      graph materialization, lineage, metrics, resume.
streaming/  Structured Streaming wrapper for the stateless scoring stage.
"""

__version__ = "0.1.0"

from gliner_spark.config import PipelineConfig  # noqa: F401
