"""Document-table readers.

The production input is an Iceberg table of interleaved docs (north rule);
this module keeps the format pluggable so the sandbox (plain parquet) and a
cluster (Iceberg catalog) share one call site.

Iceberg at scale: `spark.read.format("iceberg").load("cat.db.docs")` gives
snapshot isolation, partition pruning on doc_id bucket partitions
(`bucket(N, doc_id)` partition transform matches our lineage bucketing
1:1), and time-travel for reproducible reruns. The sandbox has no Iceberg
runtime jar, so that branch raises with instructions rather than silently
degrading.

JSON fixture loading mirrors the reference's dataset reader
(evaluate_ner.py:10-45 open_content): one JSON array of
{"tokenized_text": [...], "ner": [[s, e, label], ...]} records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gliner_spark.sources.synth import DOCS_DDL


def load_docs(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load the interleaved docs table (doc_id, spans)."""
    if fmt == "parquet":
        return spark.read.schema(DOCS_DDL).parquet(path)
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path).select("doc_id", "spans")
        except Exception as e:  # pragma: no cover - no iceberg jar in sandbox
            raise RuntimeError(
                "Iceberg runtime not on the classpath. Launch with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-4.0 and "
                "a configured catalog (spark.sql.catalog.<name>=...)."
            ) from e
    if fmt == "json":
        # explicit schema: inference would order struct fields alphabetically
        # and drop all-null columns (media_ref) — the DDL pins both
        return spark.read.schema(DOCS_DDL).json(path).select("doc_id", "spans")
    if fmt == "orc":
        return spark.read.schema(DOCS_DDL).orc(path).select("doc_id", "spans")
    if fmt == "csv":
        # flat interchange shape: CSV/TSV with the nested spans column
        # JSON-encoded (the common export from labeling tools and
        # warehouse dumps that can't hold array<struct>)
        spans_ddl = DOCS_DDL.split(", ", 1)[1].split(" ", 1)[1]
        raw = spark.read.option("header", "true").option("escape", '"').csv(path)
        return raw.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.from_json("spans_json", spans_ddl).alias("spans"),
        )
    raise ValueError(f"unknown format {fmt!r}")


def write_docs_csv(docs: DataFrame, path: str) -> None:
    """Inverse of load_docs(fmt='csv'): spans JSON-encoded into one column
    (round-trip tested)."""
    docs.select(
        "doc_id", F.to_json("spans").alias("spans_json")
    ).write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)


def load_ner_eval_json(spark: SparkSession, path: str) -> DataFrame:
    """Reference-format eval fixtures: {"tokenized_text", "ner": [[s,e,l]]}
    (evaluate_ner.py:72-97) -> NER_EVAL_DDL rows."""
    raw = spark.read.json(path)
    doc_id = (
        F.col("doc_id").cast("string")
        if "doc_id" in raw.columns
        else F.monotonically_increasing_id().cast("string")
    )
    return raw.select(
        doc_id.alias("doc_id"),
        F.col("tokenized_text").cast("array<string>"),
        F.expr(
            "transform(ner, x -> named_struct("
            "'start', cast(x[0] as int), 'end', cast(x[1] as int), "
            "'label', cast(x[2] as string)))"
        ).alias("ner"),
    )
